"""Microbench of the _edge_slice_pass components at 1e7-scale sizes
(doc/PERF.md r5: slice_edges 1.24 s — find where it goes).

Components, at the measured 1e7 totals (l1t=47.1M, l1s=1.33M,
l2=355.6M in a 454M-lane padded buffer, slnws=51.3M, l4=3.6M):

  A. l1 merge: sort(concat(bufT, mapped_small))      [the l1s>0 branch]
  B. big slice+cast: buf[:total].astype(int32)       [row_csr + lists]
  C. small searchsorted: arange(1.9M) into sorted 1.33M
  D. rows_s map + sort (1.33M)

Run: timeout 1800 python scripts/tpu_slice_microbench.py
"""

import os
import time

os.environ.setdefault("BOXTREE_TPU_CACHE",
                      os.path.expanduser("~/.cache/jax_tpu"))

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
import numpy as np                                       # noqa: E402
from jax import lax                                      # noqa: E402

import boxtree_tpu  # noqa: F401, E402


def timeit(name, f, *args):
    g = jax.jit(f)
    r = g(*args)
    jax.device_get(jnp.ravel(r if not isinstance(r, tuple)
                             else r[0])[-1:])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(*args)
        jax.device_get(jnp.ravel(r if not isinstance(r, tuple)
                                 else r[0])[-1:])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


rng = np.random.default_rng(0)
L1T, L1S, L2, L2PAD, NTB = 47_100_000, 1_330_000, 355_600_000, \
    454_000_000, 1_900_000

bufT = jax.device_put(jnp.sort(jnp.asarray(
    rng.integers(0, 1 << 52, L1T, np.int64))))
small = jax.device_put(jnp.asarray(
    rng.integers(0, 1 << 52, L1S, np.int64)))
buf2 = jax.device_put(jnp.zeros(L2PAD, jnp.int32))
rows_small = jax.device_put(jnp.asarray(
    rng.integers(0, NTB, L1S, np.int64)))

timeit("A  merge sort 48.4M int64",
       lambda a, b: lax.sort(jnp.concatenate([a, b])), bufT, small)
timeit("B  l2 slice+cast 356M of 454M int32",
       lambda b: b[:L2] + jnp.int32(1), buf2)
timeit("B2 l1t slice+cast int64->int32",
       lambda a: (a[:L1T] & jnp.int64(0xFFFFFFFF)).astype(jnp.int32),
       bufT)
timeit("C  searchsorted 1.9M into 1.33M",
       lambda r: jnp.searchsorted(
           lax.sort(r), jnp.arange(NTB + 1, dtype=r.dtype)),
       rows_small)
timeit("D  rows map+sort small",
       lambda r: lax.sort((r << jnp.int64(32)) | jnp.int64(7)),
       rows_small)
