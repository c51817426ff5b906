"""TPU wall-clock measurement: end-to-end 3D Laplace FMM + build/traversal.

The whole FMM evaluation runs as ONE ``jax.jit`` program (``drive_fmm``
is jittable with ``timing_data=None``), so the tunneled TPU pays ONE
remote compile for the evaluation instead of one per stage; the M2L
operator table is built on device from the (nops, 3) translation vectors
(``Laplace3DExpansionWrangler._m2l_ops_device``), so nothing of size
crosses the host-device link.

Env knobs: N (default 1e6), ORDER (default 8), DTYPE (c64 default / c128),
MAXP (default 30), REPEATS (default 3).

Prints progress lines (flushed) plus one final JSON line with the
measurements; meant to run in the background with an inner timeout
through the axon tunnel.
"""

import json
import os
import time

import numpy as np

t_start = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - t_start:7.1f}s] {msg}", flush=True)


import boxtree_tpu  # noqa: F401,E402
import jax  # noqa: E402

from boxtree_tpu import build_tree  # noqa: E402
from boxtree_tpu.fmm import drive_fmm  # noqa: E402
from boxtree_tpu.models.laplace import make_laplace_wrangler  # noqa: E402
from boxtree_tpu.traversal import build_traversal  # noqa: E402


def main():
    n = int(float(os.environ.get("N", 1e6)))
    order = int(os.environ.get("ORDER", 8))
    c64 = os.environ.get("DTYPE", "c64") == "c64"
    maxp = int(os.environ.get("MAXP", 30))
    repeats = int(os.environ.get("REPEATS", 3))

    rng = np.random.default_rng(17)
    # sphere-surface geometry (BASELINE config D)
    v = rng.standard_normal((3, n))
    v /= np.linalg.norm(v, axis=0)
    pts = (0.5 + 0.45 * v).astype(np.float32 if c64 else np.float64)
    q = rng.standard_normal(n).astype(np.float32 if c64 else np.float64)

    log(f"device={jax.devices()[0].platform} n={n} order={order} "
        f"c64={c64} maxp={maxp}")

    pts_d = jax.device_put(pts)
    t0 = time.perf_counter()
    tree = build_tree(pts_d, max_particles_in_box=maxp)
    jax.block_until_ready(tree.box_centers)
    log(f"tree warm (incl compiles): {time.perf_counter() - t0:.1f}s "
        f"nboxes={tree.nboxes} nlevels={tree.nlevels}")

    t0 = time.perf_counter()
    trav = build_traversal(tree)
    jax.block_until_ready(trav.neighbor_source_boxes_lists)
    log(f"traversal warm: {time.perf_counter() - t0:.1f}s "
        f"l1={trav.neighbor_source_boxes_lists.shape[0]} "
        f"l2={trav.from_sep_siblings_lists.shape[0]}")

    t0 = time.perf_counter()
    tree2 = build_tree(pts_d, max_particles_in_box=maxp)
    trav2 = build_traversal(tree2)
    jax.block_until_ready(trav2.neighbor_source_boxes_lists)
    bt_s = time.perf_counter() - t0
    log(f"build+traversal steady: {bt_s:.3f}s = {n / 1e6 / bt_s:.2f} Mpts/s")
    del tree2, trav2

    t0 = time.perf_counter()
    wrangler = make_laplace_wrangler(
        trav, order=order, dtype=np.complex64 if c64 else None)
    log(f"wrangler setup: {time.perf_counter() - t0:.1f}s "
        f"(m2l ops: {wrangler._m2l_opsT.shape})")

    # order-dependent REAL checksum computed on device: the axon tunnel
    # cannot transfer complex arrays host<->device, and an unconsumed
    # pot risks DCE (memory: tunnel-tpu-operational-facts)
    import jax.numpy as jnp
    wts = jnp.arange(1, 65, dtype=jnp.float32)

    def fmm(w):
        pot = drive_fmm(wrangler, (w,))
        return jnp.real(pot[:64]) @ wts, jnp.real(pot).sum()

    fmm = jax.jit(fmm)
    qd = jax.device_put(q)
    t0 = time.perf_counter()
    chk = jax.block_until_ready(fmm(qd))
    log(f"fmm warm (one fused compile): {time.perf_counter() - t0:.1f}s")

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        chk = jax.block_until_ready(fmm(qd))
        times.append(time.perf_counter() - t0)
    fmm_s = min(times)
    log(f"fmm steady: {[round(t, 3) for t in times]} -> best {fmm_s:.3f}s"
        f" = {n / 1e6 / fmm_s:.2f} Mpts/s")

    checksum = float(np.asarray(chk[0]))
    print(json.dumps({
        "metric": f"laplace3d_fmm_order{order}"
                  + ("_c64" if c64 else "_c128"),
        "n": n, "nboxes": int(tree.nboxes), "fmm_s": round(fmm_s, 4),
        "fmm_mpts_s": round(n / 1e6 / fmm_s, 3),
        "build_trav_s": round(bt_s, 4), "checksum": checksum,
    }), flush=True)


if __name__ == "__main__":
    main()
