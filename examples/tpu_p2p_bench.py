"""TPU microbenchmark: Pallas P2P kernel vs the XLA scan path.

Decides whether the scalar-prefetch Pallas kernel
(:mod:`boxtree_tpu.ops.pallas_p2p`) earns default-on status: both paths
evaluate the SAME List-1 stage of a real traversal through
``wrangler.eval_direct`` (the env-var dispatch is read at trace time, so
two separately-jitted closures pin the two paths).  Covers both kernel
kinds: ``coulomb`` (3D Laplace) and ``log`` (2D Laplace).

Env: N3 (default 200000), N2 (default 150000), MAXP (default 60).
"""

import json
import os
import time

import numpy as np

t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)


import boxtree_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from boxtree_tpu import build_tree  # noqa: E402
from boxtree_tpu.models.laplace import make_laplace_wrangler  # noqa: E402
from boxtree_tpu.traversal import build_traversal  # noqa: E402


def _bench(fn, *args):
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(5):
        s = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - s)
    return min(times), float(np.asarray(out))


def run(trav, label):
    tree = trav.tree
    wrangler = make_laplace_wrangler(trav, order=4, dtype=np.complex64)
    n = tree.nsources
    rng = np.random.default_rng(5)
    q = jax.device_put(rng.standard_normal(n).astype(np.float32))
    nedges = int(trav.neighbor_source_boxes_lists.shape[0])
    pmax = wrangler.tgt_blocks.pmax
    log(f"{label}: {nedges} List-1 edges, block P={pmax}, "
        f"kind={wrangler._p2p_pallas_kind}")

    wts = jnp.arange(1, 65, dtype=jnp.float32)

    def stage(w):
        pot = wrangler.eval_direct(
            trav.target_boxes, trav.neighbor_source_boxes_starts,
            trav.neighbor_source_boxes_lists, (w,))
        return jnp.real(pot[:64]) @ wts + jnp.real(pot).sum()

    os.environ["BOXTREE_TPU_PALLAS_P2P"] = "0"
    f_xla = jax.jit(lambda w: stage(w))
    t_xla, c_xla = _bench(f_xla, q)

    os.environ["BOXTREE_TPU_PALLAS_P2P"] = "1"
    f_pl = jax.jit(lambda w: stage(w))
    t_pl, c_pl = _bench(f_pl, q)
    os.environ["BOXTREE_TPU_PALLAS_P2P"] = "0"

    rel = abs(c_xla - c_pl) / max(abs(c_xla), 1e-30)
    # pair-interactions/s: nedges * P * P evaluated lanes
    pairs = nedges * pmax * pmax
    print(json.dumps({
        "bench": "p2p", "case": label, "nedges": nedges, "P": pmax,
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_ms": round(t_pl * 1e3, 3),
        "speedup_pallas": round(t_xla / t_pl, 3),
        "gpairs_s_pallas": round(pairs / t_pl / 1e9, 2),
        "checksum_rel_diff": float(rel),
    }), flush=True)


def main(trav3=None):
    maxp = int(os.environ.get("MAXP", 60))
    if trav3 is None:
        n3 = int(float(os.environ.get("N3", 2e5)))
        rng = np.random.default_rng(17)
        pts = rng.random((3, n3), np.float32)
        trav3 = build_traversal(
            build_tree(jax.device_put(pts), max_particles_in_box=maxp))
    run(trav3, "coulomb3d")

    n2 = int(float(os.environ.get("N2", 1.5e5)))
    rng = np.random.default_rng(18)
    pts2 = rng.random((2, n2), np.float32)
    trav2 = build_traversal(
        build_tree(jax.device_put(pts2), max_particles_in_box=maxp))
    run(trav2, "log2d")


if __name__ == "__main__":
    main()
