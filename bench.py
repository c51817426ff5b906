"""Headline benchmark: 3D tree build + full FMM traversal throughput.

Prints JSON lines of the form
    {"metric": ..., "value": N, "unit": "Mpoints/s", "vs_baseline": N}
the LAST such line is the official result.

The reference publishes no benchmark numbers (SURVEY.md section 6), so
``vs_baseline`` is measured against the driver-supplied north star:
1e8 points built + traversed in < 1 s on a v5p-8 (8 chips), i.e. a
single-chip-equivalent rate of 12.5 Mpoints/s.  vs_baseline > 1 means
faster than that per-chip target.

Structure (round 3): a completed measurement is *guaranteed* before any
expensive attempt.  The tunneled TPU repays every remote compile each
process (~6 min warm at 2e6) and the driver window is ~10 min, so:

1. run the safe size (BENCH_N_SAFE, default 1e6) first, walking down a
   halving ladder on failure, and print its result line immediately;
   the same subprocess also measures the 3D Laplace order-8 FMM
   wall-clock on the same tree (the other half of the official metric;
   only the FMM-stage compiles are extra) and prints it as a second
   ``laplace_fmm_3d_order8`` line, unless its deadline clock runs out;
2. only if the remaining time budget (BENCH_BUDGET_S, default 560 s,
   measured from process start) clearly covers another full warm-up,
   attempt the big size (BENCH_N, default 1e7) and print its line too.

Each problem size runs in a fresh subprocess (a failed size can crash
the accelerator worker, which would poison in-process retries).

Env knobs: BENCH_N (default 1e7), BENCH_N_SAFE (default 1e6),
BENCH_BUDGET_S (default 560), BENCH_DIMS (default 3),
BENCH_MAX_PARTICLES (default 30).
"""

import json
import os
import subprocess
import sys
import time

T_START = time.monotonic()
# Measured through the tunnel: a fresh process repays all remote
# compiles; warm-up is compile-dominated and mostly independent of n.
# The remote compile service's speed VARIES BY HOURS-SCALE CONDITIONS:
# round 3 measured both ~102 s and ~491 s warm-up at 2e6 for the same
# code.  Budget for the bad case; a timed-out accelerator attempt
# falls back to a guaranteed CPU measurement.
#
# ROUND-5 FINDING: the persistent JAX compilation cache DOES work for
# the tunneled TPU (contrary to the round-3/4 note): with
# BOXTREE_TPU_CACHE populated by a prior run of the SAME code at the
# SAME shapes, the 1e6 build+traversal warm-up drops 292 s -> 41 s.
# The repo pre-warms the cache at ~/.cache/jax_tpu for the bench's
# exact sizes at the end of each round, so the common case here is
# cache-warm; the ladder below remains the cold-cache safety net.
WARM_ESTIMATE_S = 520.0
BIG_GATE_S = 170.0     # min budget left to even try the big size
RESCUE_RESERVE_S = 110.0   # kept back for the CPU fallback measurement
BASELINE_RATE = 12.5   # Mpts/s single-chip equivalent of the north star


def run_probe():
    """Executed in a subprocess: device init only (the tunneled TPU can
    be down for hours, hanging init — probe before spending budget)."""
    import jax

    import boxtree_tpu  # noqa: F401
    print(jax.devices()[0].platform)


def _force(*arrays):
    """Force completion of device work reachable from *arrays*.

    ``jax.block_until_ready`` is a NO-OP through the axon tunnel
    (execution is fully lazy there; only host pulls force it).  Pack
    one scalar per array into a single device concat and pull THAT —
    one tunnel round trip (~25 ms) instead of one per array."""
    import jax
    import jax.numpy as jnp
    last = [x.ravel()[-1:].astype(jnp.float32) for x in arrays
            if hasattr(x, "ravel") and getattr(x, "size", 0)]
    if last:
        jax.device_get(jnp.concatenate(last))


def run_single(n):
    """Executed in a subprocess: benchmark one size; prints one JSON
    line for build+traversal and — with BENCH_FMM_INLINE=1 and budget
    left on the deadline clock — a second ``kind: laplace_fmm`` line
    measured on the SAME tree/traversal (no extra build compiles: the
    build programs are shape-specialized on n, so reusing them is what
    makes the second half of the official metric affordable within one
    warm-up)."""
    os.environ.setdefault("BOXTREE_TPU_CACHE",
                          os.path.expanduser("~/.cache/jax_tpu"))
    import numpy as np
    import jax

    import boxtree_tpu  # noqa: F401
    from boxtree_tpu import build_tree
    from boxtree_tpu.traversal import build_traversal

    t_proc = time.monotonic()
    dims = int(os.environ.get("BENCH_DIMS", 3))
    max_particles = int(os.environ.get("BENCH_MAX_PARTICLES", 30))
    rng = np.random.default_rng(17)
    pts = jax.device_put(rng.random((dims, n), dtype=np.float32))

    def run():
        tree = build_tree(pts, max_particles_in_box=max_particles)
        trav = build_traversal(tree)
        # force EVERY traversal output (the final slice passes are the
        # last device work; a single list is not enough to time them)
        _force(trav.neighbor_source_boxes_lists,
               trav.neighbor_source_boxes_starts,
               trav.same_level_non_well_sep_boxes_lists,
               trav.from_sep_siblings_lists,
               trav.from_sep_bigger_lists,
               *(bl.lists for bl in trav.from_sep_smaller_by_level))
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
        "device": jax.devices()[0].platform}), flush=True)

    # Second half of the official metric: Laplace FMM wall-clock on the
    # same tree.  Skipped when the deadline clock says the FMM-stage
    # compiles would not fit (they are the only compiles left to pay).
    deadline = float(os.environ.get("BENCH_DEADLINE_S", 0))
    if (os.environ.get("BENCH_FMM_INLINE") == "1" and deadline
            and deadline - (time.monotonic() - t_proc) > 60):
        from boxtree_tpu.fmm import staged_drive_fmm
        from boxtree_tpu.models.laplace import make_laplace_wrangler
        trav = build_traversal(tree)
        w = make_laplace_wrangler(trav, order=8, pairs=True,
                                  rscale="auto", dtype=np.float32)
        f = staged_drive_fmm(w)
        q = jax.device_put(rng.standard_normal(n).astype(np.float32))
        t0 = time.perf_counter()
        _force(f(q))
        fmm_warm_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _force(f(q))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "n": n, "dims": dims, "nboxes": tree.nboxes,
            "nlevels": tree.nlevels, "warm_s": round(fmm_warm_s, 1),
            "timed_s": round(dt, 4), "kind": "laplace_fmm",
            "device": jax.devices()[0].platform}), flush=True)


def remaining_s(budget):
    return budget - (time.monotonic() - T_START)


def try_size(n, timeout_s, env=None):
    """Run one size in a subprocess; return its list of result dicts
    (build+traversal first, optional laplace_fmm second) or None."""
    if timeout_s < 30:
        return None
    run_env = dict(os.environ, **(env or {}))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(n)],
            capture_output=True, text=True, timeout=timeout_s,
            env=run_env)
    except subprocess.TimeoutExpired:
        print(f"# n={n} timed out after {timeout_s:.0f}s", file=sys.stderr)
        return None
    results = []
    for line in proc.stdout.splitlines():
        try:
            results.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    if results:
        return results
    err = proc.stderr.strip().splitlines()
    print(f"# n={n} failed (rc={proc.returncode}); "
          f"{err[-1][:200] if err else ''}", file=sys.stderr)
    return None


def device_alive(timeout_s=90):
    """Can the accelerator backend initialize at all?  (The tunneled
    TPU can be DOWN for hours, hanging device init — a hang here must
    not eat the measurement budget.)"""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "cpu" not in proc.stdout


def emit(result):
    mpts = result["n"] / 1e6 / result["timed_s"]
    metric = ("laplace_fmm_3d_order8" if result.get("kind") == "laplace_fmm"
              else "tree_build_plus_traversal_3d")
    print(json.dumps({
        "metric": metric,
        "value": round(mpts, 3),
        "unit": "Mpoints/s",
        "vs_baseline": round(mpts / BASELINE_RATE, 4),
    }), flush=True)
    print(f"# {result}", file=sys.stderr)


def main():
    # persistent compile cache: ineffective through the axon tunnel but
    # it makes local/CPU reruns fast
    os.environ.setdefault("BOXTREE_TPU_CACHE",
                          os.path.expanduser("~/.cache/jax_tpu"))
    budget = float(os.environ.get("BENCH_BUDGET_S", 560))

    # Step 0: is the accelerator reachable?  A down tunnel hangs device
    # init; fall back to a CPU measurement so a number is ALWAYS
    # recorded (clearly marked via the stderr comment's device field).
    alive = device_alive()
    if not alive:
        print("# accelerator unreachable; falling back to CPU",
              file=sys.stderr)

    # Step 1: a guaranteed number.  The accelerator attempt gets the
    # whole budget minus a reserve for the CPU fallback; a *timeout*
    # means the remote compiles are slow today (size-independent), so
    # we go straight to the CPU rescue instead of laddering; a fast
    # *crash* retries a smaller size after a worker-recovery pause.
    n = int(float(os.environ.get("BENCH_N_SAFE", 1e6)))
    env = None if alive else {"JAX_PLATFORMS": "cpu"}
    if not alive:
        n = min(n, 500_000)            # CPU: keep compiles in budget
    results = None
    while results is None:
        reserve = RESCUE_RESERVE_S if alive else 10
        allowed = remaining_s(budget) - reserve
        t_attempt = time.monotonic()
        # the safe attempt also measures the Laplace FMM wall-clock on
        # the same tree (the second half of the official metric); the
        # subprocess skips it when the deadline clock runs short
        results = try_size(n, allowed, env=dict(
            env or {}, BENCH_FMM_INLINE="1",
            BENCH_DEADLINE_S=str(max(allowed - 30, 1))))
        if results is None:
            attempt_s = time.monotonic() - t_attempt
            if alive and attempt_s > 0.8 * allowed:
                break                  # timed out: compile-bound, bail
            n //= 2
            if n < 62_500:
                break
            if alive and remaining_s(budget) > reserve + 120:
                time.sleep(45)         # let a crashed worker recover
            elif alive:
                break
    if results is None and alive:
        # accelerator attempts failed or timed out: CPU rescue
        print("# accelerator attempts failed; CPU fallback",
              file=sys.stderr)
        results = try_size(500_000, remaining_s(budget) - 10,
                           env={"JAX_PLATFORMS": "cpu"})
        if results is None:
            results = try_size(125_000, remaining_s(budget) - 5,
                               env={"JAX_PLATFORMS": "cpu"})
    if results is None:
        raise SystemExit("benchmark failed at every size")
    result = results[0]
    for extra in results[1:]:          # laplace_fmm line (emitted first:
        emit(extra)                    # the official metric stays LAST)
    emit(result)

    # Step 2: upgrade the official line to the big size; the official
    # metric must stay the LAST line, and the safe-size lines above are
    # already emitted, so a timed-out attempt here costs nothing but
    # the leftover budget.  With the compile cache pre-warmed (the
    # common case, see the header note), the big warm-up is ~1-2 min.
    n_big = int(float(os.environ.get("BENCH_N", 1e7)))
    if (alive and n_big > result["n"]
            and remaining_s(budget) > BIG_GATE_S):
        big = try_size(n_big, remaining_s(budget) - 10)
        if big is not None:
            emit(big[0])


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        run_single(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--probe":
        run_probe()
    else:
        main()
