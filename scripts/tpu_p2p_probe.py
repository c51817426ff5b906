"""P2P stage variants on the TPU: edge-chunk sizes and the Pallas
kernel vs the XLA scan path (VERDICT round-2 item 8).

Times ONLY eval_direct over List 1 at TPU_P2P_N (default 1e6), one
parameterized jit per variant.

Run: timeout 3600 python scripts/tpu_p2p_probe.py
"""

import json
import os
import time

import numpy as np

T0 = time.monotonic()


def emit(**kw):
    kw["t"] = round(time.monotonic() - T0, 1)
    print(json.dumps(kw), flush=True)


os.environ.setdefault("BOXTREE_TPU_CACHE",
                      os.path.expanduser("~/.cache/jax_tpu"))

import jax                                                  # noqa: E402

from boxtree_tpu import build_tree                          # noqa: E402
from boxtree_tpu.fmm.drive import _harvest, _fill           # noqa: E402
from boxtree_tpu.models.laplace import make_laplace_wrangler  # noqa: E402
from boxtree_tpu.traversal import build_traversal           # noqa: E402

N = int(float(os.environ.get("TPU_P2P_N", 1e6)))
emit(stage="start", device=jax.devices()[0].platform, n=N)

rng = np.random.default_rng(17)
pts = jax.device_put(rng.random((3, N), dtype=np.float32))
tree = build_tree(pts, max_particles_in_box=30)
trav = build_traversal(tree)
jax.block_until_ready(trav.neighbor_source_boxes_lists)
emit(stage="built", nboxes=int(tree.nboxes),
     l1_edges=int(trav.neighbor_source_boxes_lists.shape[0]))

q = jax.device_put(rng.standard_normal(N).astype(np.float32))


def _p2p_sum(self, tgt_pts, src_pts, src_valid, q):
    """Reduce formulation: multiply+sum instead of ``g @ q`` so XLA can
    fuse the whole diff/r2/rsqrt/weight chain into the reduction loop
    (a dot operand forces the (nt, ns) kernel matrix to materialize)."""
    import jax.numpy as jnp
    diff = tgt_pts[:, None, :] - src_pts[None, :, :]
    r2 = (diff * diff).sum(-1)
    g = jnp.where((r2 > 0) & src_valid[None, :],
                  1.0 / jnp.sqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
    return (g * q[None, :]).sum(-1).astype(self.dtype)


def time_p2p(label, *, chunk=None, rowmajor=True, p2p=None,
             row_chunk=None):
    try:
        w = make_laplace_wrangler(trav, order=8, pairs=True,
                                  rscale="auto", dtype=np.float32)
        if chunk is not None:
            w._EDGE_CHUNK = chunk
        if p2p is not None:
            import types
            w._p2p = types.MethodType(p2p, w)
        if row_chunk is not None:
            w._P2P_ROW_CHUNK = row_chunk
        if not rowmajor:
            w._l1_rowmaps = None       # force the edge path
        leaves = []
        tmpl = _harvest(w, leaves, set(), min_bytes=65536)

        @jax.jit
        def f(ls, q):
            w2 = _fill(tmpl, ls)
            t = w2.traversal
            return w2.eval_direct(t.target_boxes,
                                  t.neighbor_source_boxes_starts,
                                  t.neighbor_source_boxes_lists, (q,))

        t0 = time.perf_counter()
        pot = f(leaves, q)
        jax.block_until_ready(pot)
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(f(leaves, q))
            ts.append(time.perf_counter() - t0)
        csum = float(np.asarray(pot).sum())
        emit(stage="p2p", label=label, warm_s=round(warm, 1),
             timed_s=round(min(ts), 3), checksum=csum)
    except Exception as e:                              # noqa: BLE001
        emit(stage="error", label=label, err=repr(e)[:250])


# row-length diagnostics: padding waste of the (ntb, lmax) row map
starts = np.asarray(trav.neighbor_source_boxes_starts)
lens = np.diff(starts)
emit(stage="rows", ntb=len(lens), lmax=int(lens.max()),
     avg=round(float(lens.mean()), 1),
     pad_waste=round(1 - float(lens.mean()) / max(int(lens.max()), 1), 3))

time_p2p("rowmajor")
time_p2p("rowmajor_sum", p2p=_p2p_sum)
time_p2p("rowmajor_sum_bt512", p2p=_p2p_sum, row_chunk=512)
time_p2p("rowmajor_bt512", row_chunk=512)
emit(stage="done")
