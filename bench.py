"""Headline benchmark: 3D tree build + full FMM traversal throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mpoints/s", "vs_baseline": N}

The reference publishes no benchmark numbers (SURVEY.md section 6), so
``vs_baseline`` is measured against the driver-supplied north star:
1e8 points built + traversed in < 1 s on a v5p-8 (8 chips), i.e. a
single-chip-equivalent rate of 12.5 Mpoints/s.  vs_baseline > 1 means
faster than that per-chip target.

Env knobs: BENCH_N (default 1e7), BENCH_DIMS (default 3),
BENCH_MAX_PARTICLES (default 30).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    import boxtree_tpu  # noqa: F401
    from boxtree_tpu import build_tree
    from boxtree_tpu.traversal import build_traversal

    n_req = int(float(os.environ.get("BENCH_N", 1e7)))
    dims = int(os.environ.get("BENCH_DIMS", 3))
    max_particles = int(os.environ.get("BENCH_MAX_PARTICLES", 30))

    rng = np.random.default_rng(17)

    def run(pts):
        tree = build_tree(pts, max_particles_in_box=max_particles)
        trav = build_traversal(tree)
        jax.block_until_ready(trav.neighbor_source_boxes_lists)
        return tree, trav

    # Fallback ladder: if a size crashes/OOMs the device, retry smaller
    # so the benchmark always reports a number.
    n = n_req
    while True:
        try:
            pts = jax.device_put(rng.random((dims, n), dtype=np.float32))
            t0 = time.perf_counter()
            tree, _ = run(pts)          # warm-up (compiles)
            warm_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            tree, trav = run(pts)
            dt = time.perf_counter() - t0
            break
        except Exception as e:          # noqa: BLE001
            print(f"# bench failed at n={n}: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            if n <= 10**6:
                raise
            n //= 4
            time.sleep(30)

    mpts = n / 1e6 / dt
    baseline_rate = 12.5  # Mpoints/s single-chip equivalent of the north star
    print(json.dumps({
        "metric": "tree_build_plus_traversal_3d",
        "value": round(mpts, 3),
        "unit": "Mpoints/s",
        "vs_baseline": round(mpts / baseline_rate, 3),
    }))
    print(f"# n={n} dims={dims} nboxes={tree.nboxes} nlevels={tree.nlevels} "
          f"warm={warm_s:.1f}s timed={dt:.3f}s "
          f"device={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
