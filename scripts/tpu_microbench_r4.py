"""Round-4 TPU microbenchmarks for the traversal-emission redesign.

Measures, on the real chip, the primitive-cost questions the round-4
optimization plan hangs on (doc/PERF.md):

1. cross-level window lookup variants at traversal scale
   (B = 1.86M rows, like the 1e7 leaf level):
   a) flat scalar gather (B, 8) from the 58M-entry table  [current]
   b) full row gather (B, 27)
   c) row gather + take_along_axis select of 8 columns
   d) row gather + one-hot compare-select of 8 columns (VPU only)
2. chunk-sort costs inside a lax.scan (the emission compaction):
   int64 sort at 0.9M / 1.5M / 6M lanes per chunk.
3. inverse permutation at 1e7: scatter vs key-value sort.
4. cumsum / exclusive cumsum at 1e7.
5. one-hot within-row compaction (rows, K=27) vs the int64 chunk sort.

Run: timeout 1800 python scripts/tpu_microbench_r4.py
"""

import os
import time

os.environ.setdefault("BOXTREE_TPU_CACHE",
                      os.path.expanduser("~/.cache/jax_tpu"))

import numpy as np                                       # noqa: E402

import boxtree_tpu                                       # noqa: E402, F401
import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
from jax import lax                                      # noqa: E402

print("device:", jax.devices()[0], flush=True)


def timeit(name, fn, *args, per=None, reps=3):
    # block_until_ready is a no-op through the axon tunnel; force
    # completion by pulling a scalar reduction of every output
    def red(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.asarray(x).ravel()[-1].astype(jnp.float32)
                   for x in leaves)

    f = jax.jit(red)
    float(f(*args))                      # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    unit = f", {best / per * 1e9:.2f} ns/elem" if per else ""
    print(f"{name}: {best * 1e3:.2f} ms{unit}", flush=True)
    return best


rng = np.random.default_rng(42)

# ---- 1. window lookup variants ----
NT = 2_163_735            # nboxes at 1e7
M = 27
B = 1_864_142             # leaf-level rows
table = jnp.asarray(rng.integers(0, NT, (NT, M), dtype=np.int32))
anc = jnp.asarray(rng.integers(0, NT, B, dtype=np.int64))
cols = jnp.asarray(rng.integers(0, M, (B, 8), dtype=np.int64))

timeit("1a flat scalar gather (B,8)",
       lambda t, a, c: t.reshape(-1)[a[:, None] * M + c],
       table, anc, cols, per=B * 8)
timeit("1b row gather (B,27)", lambda t, a: t[a], table, anc, per=B)
timeit("1c row gather + take_along_axis",
       lambda t, a, c: jnp.take_along_axis(t[a], c, axis=1),
       table, anc, cols, per=B * 8)


def onehot_select(t, a, c):
    row = t[a]                                       # (B, 27)
    sel = (c[:, :, None]
           == jnp.arange(M, dtype=c.dtype)[None, None, :])  # (B,8,27)
    return (jnp.where(sel, row[:, None, :], 0)).sum(axis=2)


timeit("1d row gather + one-hot select", onehot_select,
       table, anc, cols, per=B * 8)

# ---- 2. chunk sorts in a scan ----
for lanes in (917_504, 1_548_288, 6_291_456):
    nchunks = 16
    keys = jnp.asarray(
        rng.integers(0, 1 << 62, (nchunks, lanes), dtype=np.int64))

    def scan_sort(ks):
        def body(c, k):
            s = lax.sort(k)
            return c + s[0] + s[-1], None
        return lax.scan(body, jnp.int64(0), ks)[0]

    timeit(f"2 scan int64 sort {lanes} lanes x{nchunks}", scan_sort,
           keys, per=nchunks * lanes)

# ---- 3. inverse permutation at 1e7 ----
NP = 10_000_000
perm = jnp.asarray(rng.permutation(NP).astype(np.int32))

timeit("3a inverse perm via scatter",
       lambda p: jnp.zeros(NP, jnp.int32).at[p].set(
           jnp.arange(NP, dtype=jnp.int32), unique_indices=True),
       perm, per=NP)
timeit("3b inverse perm via k/v sort",
       lambda p: lax.sort((p, jnp.arange(NP, dtype=jnp.int32)),
                          num_keys=1)[1],
       perm, per=NP)

# ---- 4. cumsum at 1e7 ----
x = jnp.asarray(rng.integers(0, 2, NP, dtype=np.int32))
timeit("4 cumsum 1e7 int32", lambda v: jnp.cumsum(v), x, per=NP)

# ---- 5. within-row one-hot compaction vs chunk sort, K=27 ----
ROWS, K = 32_768, 27
vals = jnp.asarray(rng.integers(0, NT, (ROWS, K), dtype=np.int32))
valid = jnp.asarray(rng.random((ROWS, K)) < 0.15)


def onehot_compact(v, ok):
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
    rank = jnp.where(ok, rank, K)
    sel = rank[:, :, None] == jnp.arange(K, dtype=jnp.int32)  # (R,K,K)
    return jnp.where(sel, v[:, :, None], 0).sum(axis=1)


def chunk_sort_keys(v, ok):
    ridx = jnp.arange(ROWS, dtype=jnp.int64)[:, None]
    keys = jnp.where(ok, (ridx << 32) | v.astype(jnp.int64),
                     np.int64(np.iinfo(np.int64).max))
    return lax.sort(keys.reshape(-1))


timeit("5a one-hot compact (R=32k,K=27)", onehot_compact, vals, valid,
       per=ROWS * K)
timeit("5b int64 chunk sort same lanes", chunk_sort_keys, vals, valid,
       per=ROWS * K)
print("done", flush=True)
