"""Isolate which staged FMM program crashes the remote TPU compiler.

Compiles each stage of ``_staged_fns`` separately (small n so compile
units are quick) and reports ok/HTTP-500 per stage.  Compile-service
errors do NOT poison the worker (unlike failed TPU *ops*), so one
process probes all stages.

Run: timeout 2700 python scripts/tpu_probe_stages.py
Env: TPU_PROBE_N (default 2e5), TPU_PROBE_ORDER (default 8).
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

N = int(float(os.environ.get("TPU_PROBE_N", 2e5)))
ORDER = int(os.environ.get("TPU_PROBE_ORDER", 8))

emit(stage="start", device=jax.devices()[0].platform, n=N, order=ORDER)

rng = np.random.default_rng(17)
pts = jax.device_put(rng.random((3, N), dtype=np.float32))
tree = build_tree(pts, max_particles_in_box=30)
trav = build_traversal(tree)
jax.block_until_ready(trav.neighbor_source_boxes_lists)
emit(stage="built", nboxes=int(tree.nboxes))

w = make_laplace_wrangler(trav, order=ORDER, pairs=True, rscale="auto",
                          dtype=np.float32)
jax.block_until_ready(w._m2l_opsT)
emit(stage="wrangler", nops=int(w.m2l_plan.nops))

leaves, stages = _staged_fns(w)
q = jax.device_put(rng.standard_normal(N).astype(np.float32))

# run stages in order, isolating each compile with try/except; on a
# failure, synthesize the stage's output with zeros so later stages
# can still be probed
mp = w.multipole_expansion_zeros()
le = w.local_expansion_zeros()
pot0 = jnp.zeros((tree.ntargets,) + w._pot_extra_dims, w.dtype)
qs = (q,)

plan = [
    ("up", lambda: stages["up"](leaves, (q,))),
    ("p2p", lambda: stages["p2p"](leaves, qs)),
    ("m2l", lambda: stages["m2l"](leaves, mp)),
    ("m2p", lambda: stages["m2p"](leaves, mp)),
    ("p2l", lambda: stages["p2l"](leaves, qs)),
    ("down_eval", lambda: stages["down_eval"](leaves, le, (pot0, pot0))),
]

for name, fn in plan:
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if name == "up":
            qs, mp = out
        elif name == "m2l":
            le = out
        emit(stage=name, ok=True, compile_s=round(dt, 1))
    except Exception as e:                              # noqa: BLE001
        emit(stage=name, ok=False, err=repr(e)[:200],
             dt=round(time.perf_counter() - t0, 1))

emit(stage="done")
