"""Per-stage TPU timings of the staged Laplace FMM (pairs, order 8).

Uses ``_staged_fns`` so each stage is its own program; times each with
device sync after warm-up, plus an f64 host direct-sum accuracy check
on 512 targets (the on-device f32 reference of tpu_fmm_pairs.py
carries its own rounding error).

Run: timeout 3600 python scripts/tpu_fmm_profile.py
Env: TPU_FMMPROF_N (default 1e6), TPU_FMMPROF_ORDER (default 8).
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
import jax.numpy as jnp                                     # noqa: E402

from boxtree_tpu import build_tree                          # noqa: E402
from boxtree_tpu.fmm.drive import _staged_fns               # noqa: E402
from boxtree_tpu.models.laplace import make_laplace_wrangler  # noqa: E402
from boxtree_tpu.traversal import build_traversal           # noqa: E402

N = int(float(os.environ.get("TPU_FMMPROF_N", 1e6)))
ORDER = int(os.environ.get("TPU_FMMPROF_ORDER", 8))
MODE = os.environ.get("TPU_FMMPROF_M2L", "dense")

emit(stage="start", device=jax.devices()[0].platform, n=N, order=ORDER,
     m2l=MODE)

rng = np.random.default_rng(17)
pts_h = rng.random((3, N), dtype=np.float32)
pts = jax.device_put(pts_h)
tree = build_tree(pts, max_particles_in_box=30)
trav = build_traversal(tree)
jax.block_until_ready(trav.neighbor_source_boxes_lists)
emit(stage="built", nboxes=int(tree.nboxes))

w = make_laplace_wrangler(trav, order=ORDER, pairs=True, rscale="auto",
                          dtype=np.float32, m2l_mode=MODE)
jax.block_until_ready(getattr(w, "_m2l_opsT", None))
e2 = int(w.m2l_plan.tgt.shape[0])
emit(stage="wrangler", nops=int(w.m2l_plan.nops), m2l_edges=e2)

leaves, stages = _staged_fns(w)
q_h = rng.standard_normal(N).astype(np.float32)
q = jax.device_put(q_h)

qs, mp = stages["up"](leaves, (q,))
pot_d = stages["p2p"](leaves, qs)
le = stages["m2l"](leaves, mp)
pot_m = stages["m2p"](leaves, mp)
le4 = stages["p2l"](leaves, qs)
pot = stages["down_eval"](leaves, le + le4, (pot_d, pot_m))
jax.block_until_ready(pot)
emit(stage="warm")

plan = [("up", lambda: stages["up"](leaves, (q,))),
        ("p2p", lambda: stages["p2p"](leaves, qs)),
        ("m2l", lambda: stages["m2l"](leaves, mp)),
        ("m2p", lambda: stages["m2p"](leaves, mp)),
        ("p2l", lambda: stages["p2l"](leaves, qs)),
        ("down_eval",
         lambda: stages["down_eval"](leaves, le, (pot_d, pot_m)))]
total = 0.0
for name, fn in plan:
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    emit(stage="time", which=name, s=round(min(ts), 3))
    total += min(ts)
emit(stage="total", s=round(total, 3), mpts=round(N / 1e6 / total, 3))

# accuracy vs an f64 HOST direct sum on 512 targets
idx = np.sort(rng.choice(N, 512, replace=False))
p64 = pts_h.astype(np.float64)
t64 = p64[:, idx]
acc = np.zeros(512)
q64 = q_h.astype(np.float64)
for a in range(0, N, 200000):
    b = min(a + 200000, N)
    d2 = ((t64[:, :, None] - p64[:, None, a:b]) ** 2).sum(axis=0)
    np.reciprocal(np.sqrt(d2, out=d2), out=d2)
    d2[~np.isfinite(d2)] = 0.0
    acc += d2 @ q64[a:b]
pot_h = np.asarray(pot)[idx].astype(np.float64)
err = np.abs(pot_h - acc).max() / np.abs(acc).max()
emit(stage="accuracy_f64ref", rel_linf=float(err))
emit(stage="done")
