"""Headline benchmark: 3D tree build + full FMM traversal throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mpoints/s", "vs_baseline": N}

The reference publishes no benchmark numbers (SURVEY.md section 6), so
``vs_baseline`` is measured against the driver-supplied north star:
1e8 points built + traversed in < 1 s on a v5p-8 (8 chips), i.e. a
single-chip-equivalent rate of 12.5 Mpoints/s.  vs_baseline > 1 means
faster than that per-chip target.

Each problem size runs in a fresh subprocess (a failed size can crash
the accelerator worker, which would poison in-process retries); the
ladder walks down until a size succeeds.

Env knobs: BENCH_N (default 2e6), BENCH_DIMS (default 3),
BENCH_MAX_PARTICLES (default 30).

The round-1 >2e6 remote-compiler SIGSEGV no longer reproduces with the
round-2 sort-based traversal fills; 1e7 (the BASELINE metric size) runs
on the tunneled v5e.  The subprocess ladder still guards against
regressions by halving n on failure.
"""

import json
import os
import subprocess
import sys
import time


def run_single(n):
    """Executed in a subprocess: benchmark one size, print one line."""
    os.environ.setdefault("BOXTREE_TPU_CACHE",
                          os.path.expanduser("~/.cache/jax_tpu"))
    import numpy as np
    import jax

    import boxtree_tpu  # noqa: F401
    from boxtree_tpu import build_tree
    from boxtree_tpu.traversal import build_traversal

    dims = int(os.environ.get("BENCH_DIMS", 3))
    max_particles = int(os.environ.get("BENCH_MAX_PARTICLES", 30))
    rng = np.random.default_rng(17)
    pts = jax.device_put(rng.random((dims, n), dtype=np.float32))

    def run():
        tree = build_tree(pts, max_particles_in_box=max_particles)
        trav = build_traversal(tree)
        jax.block_until_ready(trav.neighbor_source_boxes_lists)
        return tree

    t0 = time.perf_counter()
    tree = run()                       # warm-up (compiles)
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    tree = run()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "n": n, "dims": dims, "nboxes": tree.nboxes,
        "nlevels": tree.nlevels, "warm_s": round(warm_s, 1),
        "timed_s": round(dt, 4),
        "device": jax.devices()[0].platform}))


def main():
    # persistent compile cache: the tunneled TPU's remote compiles are
    # slow (~6 min warm at 1e7); cached reruns take seconds
    os.environ.setdefault("BOXTREE_TPU_CACHE",
                          os.path.expanduser("~/.cache/jax_tpu"))
    n = int(float(os.environ.get("BENCH_N", 1e7)))
    result = None
    while n >= 250_000:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(n)],
            capture_output=True, text=True, timeout=3600)
        for line in proc.stdout.splitlines():
            try:
                result = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        if result is not None:
            break
        print(f"# n={n} failed (rc={proc.returncode}); "
              f"{proc.stderr.strip().splitlines()[-1][:200] if proc.stderr.strip() else ''}",
              file=sys.stderr)
        n //= 2
        time.sleep(45)                 # let a crashed worker recover

    if result is None:
        raise SystemExit("benchmark failed at every size")

    mpts = result["n"] / 1e6 / result["timed_s"]
    baseline_rate = 12.5   # Mpts/s single-chip equivalent of the north star
    print(json.dumps({
        "metric": "tree_build_plus_traversal_3d",
        "value": round(mpts, 3),
        "unit": "Mpoints/s",
        "vs_baseline": round(mpts / baseline_rate, 4),
    }))
    print(f"# {result}", file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        run_single(int(sys.argv[2]))
    else:
        main()
