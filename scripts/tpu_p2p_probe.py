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


def time_p2p(label, *, chunk=None, rowmajor=True):
    try:
        w = make_laplace_wrangler(trav, order=8, pairs=True,
                                  rscale="auto", dtype=np.float32)
        if chunk is not None:
            w._EDGE_CHUNK = chunk
        if not rowmajor:
            w._l1_rowmap = None        # force the edge path
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


time_p2p("rowmajor")
time_p2p("edges4096", rowmajor=False)
emit(stage="done")
