"""Row-gather cost vs row width (is the (N, 27) neighbor-table row
gather hitting the narrow-gather serialization?).

3.6M row gathers from a 2.2M-row int32 table at widths
1 / 8 / 27 / 32 / 64 / 128, plus a scalar (flat) gather baseline.
Run: timeout 1500 python scripts/tpu_rowgather_width.py
"""

import os
import time

os.environ.setdefault("BOXTREE_TPU_CACHE",
                      os.path.expanduser("~/.cache/jax_tpu"))

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
import numpy as np                                       # noqa: E402

import boxtree_tpu  # noqa: F401, E402

N, NG = 2_200_000, 3_600_000
rng = np.random.default_rng(0)
idx = jax.device_put(jnp.asarray(rng.integers(0, N, NG, np.int32)))


def timeit(name, f, *args):
    g = jax.jit(f)
    r = g(*args)
    jax.device_get(jnp.ravel(r)[-1:])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(*args)
        jax.device_get(jnp.ravel(r)[-1:])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


for w in (1, 8, 27, 32, 64, 128):
    tab = jax.device_put(jnp.zeros((N, w), jnp.int32))
    timeit(f"(N,{w:3d}) row gather",
           lambda t, i: t[i].sum(axis=1), tab, idx)
    del tab

flat = jax.device_put(jnp.zeros(N, jnp.int32))
timeit("(N,) scalar gather", lambda t, i: t[i], flat, idx)
