"""First TPU Laplace FMM wall-clock: the complex-free real-pair
wrangler at order 8, one jit over the whole driver.

Prints one JSON line per completed measurement (partial results survive
a timeout).  Sizes: 1e6 first (BASELINE config D), then 2e6 if budget
remains.

Run: timeout 3300 python scripts/tpu_fmm_pairs.py
Env: TPU_FMM_BUDGET_S (default 3000), TPU_FMM_ORDER (default 8).
"""

import json
import os
import time

import numpy as np

T0 = time.monotonic()
BUDGET = float(os.environ.get("TPU_FMM_BUDGET_S", 3000))
ORDER = int(os.environ.get("TPU_FMM_ORDER", 8))


def left():
    return BUDGET - (time.monotonic() - T0)


def emit(**kw):
    kw["t"] = round(time.monotonic() - T0, 1)
    print(json.dumps(kw), flush=True)


os.environ.setdefault("BOXTREE_TPU_CACHE",
                      os.path.expanduser("~/.cache/jax_tpu"))

import jax                                                  # noqa: E402
import jax.numpy as jnp                                     # noqa: E402

from boxtree_tpu import build_tree                          # noqa: E402
from boxtree_tpu.fmm import drive_fmm, staged_drive_fmm                   # noqa: E402
from boxtree_tpu.models.laplace import make_laplace_wrangler  # noqa: E402
from boxtree_tpu.traversal import build_traversal           # noqa: E402

emit(stage="start", device=jax.devices()[0].platform, order=ORDER)


def run_fmm(n, seed, with_accuracy):
    rng = np.random.default_rng(seed)
    pts = jax.device_put(rng.random((3, n), dtype=np.float32))
    charges = jax.device_put(rng.standard_normal(n).astype(np.float32))
    wvec = jnp.arange(n, dtype=jnp.float32) * (1.0 / n)

    t0 = time.perf_counter()
    tree = build_tree(pts, max_particles_in_box=30)
    trav = build_traversal(tree)
    jax.block_until_ready(trav.neighbor_source_boxes_lists)
    bt_warm = time.perf_counter() - t0
    emit(stage="build_traversal", n=n, nboxes=int(tree.nboxes),
         warm_s=round(bt_warm, 1))

    t0 = time.perf_counter()
    # float32 everywhere: the tunneled TPU's X64 rewrite rejects 64-bit
    # dot_generals, and f32 is the production precision anyway
    w = make_laplace_wrangler(trav, order=ORDER, pairs=True,
                              rscale="auto", dtype=np.float32)
    jax.block_until_ready(w._m2l_opsT)
    setup = time.perf_counter() - t0
    emit(stage="wrangler_setup", n=n, order=ORDER,
         nops=int(w.m2l_plan.nops), ncoeff=int(w.ncoeff),
         table_mb=round(w._m2l_opsT.size * 4 / 1e6, 1),
         setup_s=round(setup, 1))

    # per-stage jits: the whole-driver program crashes the tunneled
    # remote compiler (HTTP 500) even with the parameterized payload
    f = staged_drive_fmm(w)
    t0 = time.perf_counter()
    pot = f(charges)
    jax.block_until_ready(pot)
    fwarm = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        pot = f(charges)
        jax.block_until_ready(pot)
        ts.append(time.perf_counter() - t0)
    csum = float(jnp.vdot(wvec, pot))
    emit(stage="laplace_fmm_pairs", n=n, order=ORDER,
         warm_s=round(fwarm, 1), timed_s=round(min(ts), 3),
         mpts=round(n / 1e6 / min(ts), 3), checksum=csum)

    if with_accuracy:
        idx = np.sort(rng.choice(n, 512, replace=False))
        tgt = pts[:, idx]

        @jax.jit
        def direct(q):
            def body(acc, chunk):
                sp, qc = chunk
                d2 = ((tgt[:, :, None] - sp[:, None, :]) ** 2).sum(0)
                inv = jnp.where(d2 > 0, 1.0 / jnp.sqrt(
                    jnp.where(d2 > 0, d2, 1.0)), 0.0)
                return acc + inv @ qc, None
            nch = 250
            acc, _ = jax.lax.scan(
                body, jnp.zeros(512, np.float32),
                (pts.reshape(3, nch, -1).swapaxes(0, 1),
                 q.reshape(nch, -1)))
            return acc

        try:
            ref = direct(charges)
            err = float(jnp.max(jnp.abs(pot[idx] - ref))
                        / jnp.max(jnp.abs(ref)))
            emit(stage="accuracy", n=n, order=ORDER, rel_linf=err)
        except Exception as e:                          # noqa: BLE001
            emit(stage="error", what="accuracy", err=repr(e)[:300])


try:
    run_fmm(1_000_000, 17, with_accuracy=True)
except Exception as e:                                  # noqa: BLE001
    emit(stage="error", what="fmm_1e6", err=repr(e)[:300])

if left() > 700:
    try:
        run_fmm(2_000_000, 23, with_accuracy=False)
    except Exception as e:                              # noqa: BLE001
        emit(stage="error", what="fmm_2e6", err=repr(e)[:300])

emit(stage="done")
