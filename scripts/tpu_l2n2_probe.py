"""Isolate the well_sep_is_n_away=2 List-2 emission cost on the TPU.

The full 2e6 2-away traversal measures ~36 s in emit_rowlists
(~135 ns/lane vs ~3.4 ns at n=1); this probe times the pieces of the
`_emit_l2_parent_rowcsr` chunk body at n=2 shapes (B=1024 parents,
m=125 columns, K=875 pairs/child) on synthetic data:

  g1: the (B, m, 2^d) child-row gather
  g2: + the static (2^d, K) pair-lane gather
  g3: + key build + chunk sort + compaction write (full body), scanned
      over 32 chunks with a large carried buffer

Run: timeout 1800 python scripts/tpu_l2n2_probe.py
"""

import json
import os
import time

os.environ.setdefault("BOXTREE_TPU_CACHE",
                      os.path.expanduser("~/.cache/jax_tpu"))

import numpy as np                                        # noqa: E402
import jax                                                # noqa: E402
import jax.numpy as jnp                                   # noqa: E402
from jax import lax                                       # noqa: E402

from boxtree_tpu import config  # noqa: F401,E402
from boxtree_tpu.traversal.neighbors import (             # noqa: E402
    _list2_valid_pairs)

T0 = time.monotonic()


def emit(**kw):
    kw["t"] = round(time.monotonic() - T0, 1)
    print(json.dumps(kw), flush=True)


emit(stage="start", device=jax.devices()[0].platform)

B, D, N_AWAY = 1024, 3, 2
M = (2 * N_AWAY + 1) ** D
NCHILD = 2 ** D
NBOXES = 300_000
NCHUNKS = 32
INVALID = np.int64(np.iinfo(np.int64).max)

rng = np.random.default_rng(3)
pn_all = jax.device_put(rng.integers(
    0, NBOXES, (NCHUNKS, B, M)).astype(np.int32))
child_rows = jax.device_put(rng.integers(
    0, NBOXES, (NBOXES, NCHILD)).astype(np.int32))
own_all = jax.device_put(rng.integers(
    1, NBOXES, (NCHUNKS, B, NCHILD)).astype(np.int32))

pairs = _list2_valid_pairs(D, N_AWAY)
K = len(pairs[0])
pair_idx = np.asarray([[j * NCHILD + q for (j, q) in pairs[r]]
                       for r in range(NCHILD)])
emit(stage="shapes", m=M, k=K, lanes_per_chunk=B * NCHILD * K)


def timeit(label, f, *args):
    out = jax.jit(f)(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(f)(*args))
        ts.append(time.perf_counter() - t0)
    emit(stage="time", label=label, s=round(min(ts), 4))


def g1(pn_all):
    def body(acc, pn):
        pid = (jnp.clip(pn, 0) & np.int32((1 << 29) - 1)).astype(jnp.int64)
        ch = child_rows[pid]
        return acc + ch.sum(), None
    return lax.scan(body, jnp.int32(0), pn_all)[0]


def g2(pn_all):
    def body(acc, pn):
        pid = (jnp.clip(pn, 0) & np.int32((1 << 29) - 1)).astype(jnp.int64)
        ch = child_rows[pid]
        cand_all = ch.reshape(B, M * NCHILD)
        cand = cand_all[:, pair_idx]
        return acc + cand.sum(), None
    return lax.scan(body, jnp.int32(0), pn_all)[0]


def g3(pn_all, own_all):
    size = NCHUNKS * B * NCHILD * K
    buf = jnp.zeros(size, jnp.int32)

    def body(carry, inp):
        buf, off = carry
        pn, own = inp
        pid = (jnp.clip(pn, 0) & np.int32((1 << 29) - 1)).astype(jnp.int64)
        ch = child_rows[pid]
        cand_all = ch.reshape(B, M * NCHILD)
        cand = cand_all[:, pair_idx]
        valid = (cand >= 0) & (own > 0)[..., None]
        keys = jnp.where(
            valid, (own.astype(jnp.int64)[..., None] << np.int64(32))
            | cand.astype(jnp.int64), INVALID)
        skeys = lax.sort(keys.reshape(-1))
        buf = lax.dynamic_update_slice(
            buf, (skeys & np.int64(0xFFFFFFFF)).astype(jnp.int32), (off,))
        nv = valid.sum().astype(jnp.int64)
        return (buf, off + nv), None

    (buf, off), _ = lax.scan(body, (buf, jnp.int64(0)),
                             (pn_all, own_all))
    return buf[0] + off


def g3_nosort(pn_all, own_all):
    size = NCHUNKS * B * NCHILD * K
    buf = jnp.zeros(size, jnp.int32)

    def body(carry, inp):
        buf, off = carry
        pn, own = inp
        pid = (jnp.clip(pn, 0) & np.int32((1 << 29) - 1)).astype(jnp.int64)
        ch = child_rows[pid]
        cand_all = ch.reshape(B, M * NCHILD)
        cand = cand_all[:, pair_idx]
        valid = (cand >= 0) & (own > 0)[..., None]
        buf = lax.dynamic_update_slice(
            buf, jnp.where(valid, cand, -1).astype(jnp.int32).reshape(-1),
            (off,))
        nv = valid.sum().astype(jnp.int64)
        return (buf, off + nv), None

    (buf, off), _ = lax.scan(body, (buf, jnp.int64(0)),
                             (pn_all, own_all))
    return buf[0] + off


timeit("g1_child_gather", g1, pn_all)
timeit("g2_plus_pair_gather", g2, pn_all)
timeit("g3_full_body", g3, pn_all, own_all)
timeit("g3_nosort", g3_nosort, pn_all, own_all)
emit(stage="done")
