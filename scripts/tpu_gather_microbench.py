"""Gather-layout microbench: how fast are row gathers as a function of
row width and alignment?  (The P2P pack gather moves ~2.8 GB in 0.57 s
= ~5 GB/s — find the layout that doesn't serialize.)

Cases, all gathering 3.6M rows from a 164k-row table (the 1e6 P2P
shape), f32:
  A. (N, 32, 6)  — current pack layout (minor dim 6, unaligned)
  B. (N, 192)    — flattened, still not lane-aligned
  C. (N, 256)    — flattened + padded to 2 lanes of 128
  D. (N, 128)    — one exact lane
  E. take_along_axis on (N, 256) reshaped differently
Run: timeout 1800 python scripts/tpu_gather_microbench.py
"""

import os
import time

os.environ.setdefault("BOXTREE_TPU_CACHE",
                      os.path.expanduser("~/.cache/jax_tpu"))

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
import numpy as np                                       # noqa: E402

import boxtree_tpu  # noqa: F401, E402

N, NG = 164_000, 3_600_000
rng = np.random.default_rng(0)
idx = jax.device_put(jnp.asarray(
    rng.integers(0, N, NG, np.int32)))


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
    bytes_moved = r.size * r.dtype.itemsize
    gbs = bytes_moved / min(ts) / 1e9
    print(f"{name}: {min(ts)*1e3:.1f} ms  ({gbs:.1f} GB/s)", flush=True)


tabA = jax.device_put(jnp.zeros((N, 32, 6), jnp.float32))
timeit("A (N,32,6) gather", lambda t, i: t[i].sum(axis=(1, 2)),
       tabA, idx)
del tabA
tabB = jax.device_put(jnp.zeros((N, 192), jnp.float32))
timeit("B (N,192) gather", lambda t, i: t[i].sum(axis=1), tabB, idx)
del tabB
tabC = jax.device_put(jnp.zeros((N, 256), jnp.float32))
timeit("C (N,256) gather", lambda t, i: t[i].sum(axis=1), tabC, idx)
timeit("C2 (N,256) gather no-reduce",
       lambda t, i: t[i][:, ::64], tabC, idx)
del tabC
tabD = jax.device_put(jnp.zeros((N, 128), jnp.float32))
timeit("D (N,128) gather", lambda t, i: t[i].sum(axis=1), tabD, idx)
del tabD
tabE = jax.device_put(jnp.zeros((8 * N, 256), jnp.float32))
idx8 = (idx.astype(jnp.int64) * 8)[:NG // 8]
timeit("E (8N,256) gather sparse rows",
       lambda t, i: t[i].sum(axis=1), tabE, idx8)
