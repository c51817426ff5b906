"""Round-3 TPU measurement batch.

One process (the axon tunnel repays every remote compile per process)
that prints one JSON line per completed measurement, so partial results
survive a timeout:

  A. 3D tree build + traversal at TPU_BATCH_N (default 2e6): warm +
     steady-state Mpts/s (effect of the round-3 traversal rework).
  B. Laplace 3D FMM wall-clock at the same size, order 8, float32
     real pairs (the chip has no complex support),
     whole driver under ONE jit — dense-table and rotation
     (point-and-shoot) M2L modes, plus a 512-target direct-sum
     accuracy check (VERDICT round-2 items 2 and 3).
  C. Pallas vs XLA-scan P2P on the same traversal (VERDICT item 8).
  D. (budget permitting) order-16 FMM, both M2L modes.
  E. (budget permitting) 1e7 build + traversal.

Run:  timeout 3000 python scripts/tpu_batch_r3.py
Env:  TPU_BATCH_N (default 2e6), TPU_BATCH_BUDGET_S (default 2700).
"""

import json
import os
import time

import numpy as np

T0 = time.monotonic()
BUDGET = float(os.environ.get("TPU_BATCH_BUDGET_S", 2700))


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
from boxtree_tpu.fmm import drive_fmm, jit_drive_fmm                       # noqa: E402
from boxtree_tpu.models.laplace import make_laplace_wrangler  # noqa: E402
from boxtree_tpu.traversal import build_traversal           # noqa: E402

emit(stage="start", device=jax.devices()[0].platform,
     ndevices=len(jax.devices()))

n = int(float(os.environ.get("TPU_BATCH_N", 2e6)))
rng = np.random.default_rng(17)
pts = jax.device_put(rng.random((3, n), dtype=np.float32))


def bt(p):
    tree = build_tree(p, max_particles_in_box=30)
    trav = build_traversal(tree)
    jax.block_until_ready(trav.neighbor_source_boxes_lists)
    return tree, trav


# A: build + traversal
t0 = time.perf_counter()
tree, trav = bt(pts)
warm = time.perf_counter() - t0
times = []
for _ in range(2):
    t0 = time.perf_counter()
    tree, trav = bt(pts)
    times.append(time.perf_counter() - t0)
bt_s = min(times)
emit(stage="build_traversal", n=n, nboxes=int(tree.nboxes),
     nlevels=int(tree.nlevels), warm_s=round(warm, 1),
     timed_s=round(bt_s, 3), mpts=round(n / 1e6 / bt_s, 3))

# B: Laplace FMM wall-clock, both M2L modes
charges = jax.device_put(rng.standard_normal(n).astype(np.float32))
wvec = jnp.arange(n, dtype=jnp.float32) * (1.0 / n)
dense_wrangler = None
for mode in ("dense", "rotation"):
    if mode == "rotation" and left() < 400:
        emit(stage="skip", what="rotation", left=round(left()))
        break
    try:
        t0 = time.perf_counter()
        w = make_laplace_wrangler(trav, order=8, dtype=np.float32,
                                  pairs=True, rscale="auto",
                                  m2l_mode=mode)
        setup = time.perf_counter() - t0
        if mode == "dense":
            dense_wrangler = w
        f = jit_drive_fmm(w)
        t0 = time.perf_counter()
        pot = f(charges)
        jax.block_until_ready(pot)
        fwarm = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            pot = f(charges)
            jax.block_until_ready(pot)
            ts.append(time.perf_counter() - t0)
        csum = float(jnp.real(jnp.vdot(wvec, pot)))
        emit(stage="laplace_fmm", mode=mode, n=n, order=8,
             setup_s=round(setup, 1), warm_s=round(fwarm, 1),
             timed_s=round(min(ts), 3),
             mpts=round(n / 1e6 / min(ts), 3), checksum=csum)
    except Exception as e:                              # noqa: BLE001
        emit(stage="error", what=f"laplace_fmm:{mode}",
             err=repr(e)[:300])

# accuracy spot check: 512 targets vs chunked direct sum on device
if dense_wrangler is not None:
    try:
        idx = rng.choice(n, 512, replace=False)
        tgt = pts[:, idx]                               # (3, 512)

        @jax.jit
        def direct(q):
            def body(acc, chunk):
                sp, qc = chunk                          # (3, C), (C,)
                d2 = ((tgt[:, :, None] - sp[:, None, :]) ** 2).sum(0)
                inv = jnp.where(d2 > 0, 1.0 / jnp.sqrt(
                    jnp.where(d2 > 0, d2, 1.0)), 0.0)
                return acc + inv @ qc, None
            nch = 200
            acc, _ = jax.lax.scan(
                body, jnp.zeros(512, np.float32),
                (pts.reshape(3, nch, -1).swapaxes(0, 1),
                 q.reshape(nch, -1)))
            return acc

        ref = direct(charges)
        f = jit_drive_fmm(dense_wrangler)
        pot = f(charges)
        err = float(jnp.max(jnp.abs(jnp.real(pot[idx]) - ref))
                    / jnp.max(jnp.abs(ref)))
        emit(stage="accuracy", n=n, order=8, rel_linf=err)
    except Exception as e:                              # noqa: BLE001
        emit(stage="error", what="accuracy", err=repr(e)[:300])

# C: Pallas vs XLA-scan P2P
if dense_wrangler is not None and left() > 200:
    for use_pallas in (False, True):
        try:
            os.environ["BOXTREE_TPU_PALLAS_P2P"] = \
                "1" if use_pallas else "0"
            w = dense_wrangler
            f = jax.jit(lambda q: w.eval_direct(
                trav.target_boxes,
                trav.neighbor_source_boxes_starts,
                trav.neighbor_source_boxes_lists, (q,)))
            pot = f(charges)
            jax.block_until_ready(pot)
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                pot = f(charges)
                jax.block_until_ready(pot)
                ts.append(time.perf_counter() - t0)
            csum = float(jnp.real(jnp.vdot(wvec, pot)))
            emit(stage="p2p", pallas=use_pallas,
                 timed_s=round(min(ts), 3), checksum=csum)
        except Exception as e:                          # noqa: BLE001
            emit(stage="error", what=f"p2p:{use_pallas}",
                 err=repr(e)[:300])
    os.environ.pop("BOXTREE_TPU_PALLAS_P2P", None)

# D: order-16 FMM, both modes (dense table is ~845 MB at order 16 —
# rotation should win; measure it)
if left() > 900:
    for mode in ("rotation", "dense"):
        if left() < 350:
            emit(stage="skip", what=f"order16:{mode}", left=round(left()))
            break
        try:
            t0 = time.perf_counter()
            w = make_laplace_wrangler(trav, order=16, dtype=np.float32,
                                      pairs=True, rscale="auto",
                                      m2l_mode=mode)
            setup = time.perf_counter() - t0
            f = jit_drive_fmm(w)
            pot = f(charges)
            jax.block_until_ready(pot)
            t0 = time.perf_counter()
            pot = f(charges)
            jax.block_until_ready(pot)
            dt = time.perf_counter() - t0
            csum = float(jnp.real(jnp.vdot(wvec, pot)))
            emit(stage="laplace_fmm", mode=mode, n=n, order=16,
                 setup_s=round(setup, 1), timed_s=round(dt, 3),
                 mpts=round(n / 1e6 / dt, 3), checksum=csum)
            del w, f, pot
        except Exception as e:                          # noqa: BLE001
            emit(stage="error", what=f"order16:{mode}",
                 err=repr(e)[:300])

# E: 1e7 build + traversal
if left() > 600:
    try:
        n_big = 10_000_000
        pts_big = jax.device_put(
            np.random.default_rng(7).random((3, n_big), dtype=np.float32))
        t0 = time.perf_counter()
        tree_b, _ = bt(pts_big)
        warm_b = time.perf_counter() - t0
        t0 = time.perf_counter()
        tree_b, _ = bt(pts_big)
        dt = time.perf_counter() - t0
        emit(stage="build_traversal", n=n_big, nboxes=int(tree_b.nboxes),
             warm_s=round(warm_b, 1), timed_s=round(dt, 3),
             mpts=round(n_big / 1e6 / dt, 3))
    except Exception as e:                              # noqa: BLE001
        emit(stage="error", what="1e7", err=repr(e)[:300])

emit(stage="done")
