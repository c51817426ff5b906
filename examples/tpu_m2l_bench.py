"""TPU microbenchmark: dense grouped-matmul M2L vs point-and-shoot.

Resolves the rotation-class question with data (doc/PERF.md): per M2L
edge the dense path does one (K, K) matmul (O(p^4)) in ONE grouped
matmul over all edges; the rotation path does 4p+3 grouped matmuls of
small blocks (O(p^3) flops).  Orders 8/16 run through the REAL wrangler
code paths on a small tree's M2L plan with synthetic edge counts;
results print as JSON lines.

Env: E (edges, default 131072), ORDERS (default "8,16").
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
from boxtree_tpu.models.particle_blocks import grouped_matmul  # noqa: E402
from boxtree_tpu.traversal import build_traversal  # noqa: E402


def bench(fn, *args):
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(5):
        s = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - s)
    del out
    return min(times)


def main(trav=None):
    e_total = int(os.environ.get("E", 131072))
    orders = [int(x) for x in os.environ.get("ORDERS", "8,16").split(",")]

    if trav is None:
        rng = np.random.default_rng(17)
        pts = rng.random((3, 200_000), np.float32)
        tree = build_tree(jax.device_put(pts), max_particles_in_box=60)
        trav = build_traversal(tree)
    log(f"tree {trav.tree.nboxes} boxes; device="
        f"{jax.devices()[0].platform}")

    for order in orders:
        k = (order + 1) ** 2
        dense = make_laplace_wrangler(trav, order=order,
                                      dtype=np.complex64)
        rot = make_laplace_wrangler(trav, order=order,
                                    dtype=np.complex64,
                                    m2l_mode="rotation")
        nops = dense.m2l_plan.nops
        log(f"order {order}: K={k} nops={nops} "
            f"nrot={rot._m2l_rot.nrotations}")

        # synthetic uniform edge distribution over the real operators
        gs = np.full(nops, e_total // nops, np.int32)
        gs[:e_total % nops] += 1
        gs_d = jnp.asarray(gs)
        # generate the multipole rows ON device: a complex upload of
        # E x K (85-330 MB) would take minutes through the tunnel
        re, im = jax.jit(lambda: (
            jax.random.normal(jax.random.PRNGKey(0), (e_total, k),
                              jnp.float32),
            jax.random.normal(jax.random.PRNGKey(1), (e_total, k),
                              jnp.float32)))()
        mp = jax.jit(lambda a, b: (a + 1j * b).astype(jnp.complex64))(
            re, im)

        f_dense = jax.jit(
            lambda m, g: grouped_matmul(m, dense._m2l_opsT, g))
        f_rot = jax.jit(lambda m, g: rot._m2l_rot.apply(m, g))

        t_dense = bench(f_dense, mp, gs_d)
        t_rot = bench(f_rot, mp, gs_d)
        flops_dense = 8 * e_total * k * k            # c64 matmul
        print(json.dumps({
            "order": order, "E": e_total, "nops": nops,
            "dense_ms": round(t_dense * 1e3, 3),
            "rotation_ms": round(t_rot * 1e3, 3),
            "dense_gflops": round(flops_dense / t_dense / 1e9, 1),
            "speedup_rotation": round(t_dense / t_rot, 3),
        }), flush=True)
        del dense, rot, mp


if __name__ == "__main__":
    main()
