"""Distributed key sort over a device mesh (sample sort).

The first building block of the sharded tree build (doc/PERF.md,
"Sharded build" design note): the reference's tree build is
sort-dominated, and the single-device Morton sort is the piece that
cannot scale past one chip's HBM.  This is the standard sample-sort
recast for SPMD execution with static shapes:

1. each device sorts its local keys (``lax.sort``),
2. a small per-device sample is ``all_gather``-ed and D-1 splitters are
   read off the sorted global sample,
3. each device's (already sorted) keys split into D contiguous bucket
   slices (``searchsorted`` — no data movement),
4. one ``all_to_all`` ships bucket ``b`` of every device to device
   ``b`` in a fixed-capacity padded buffer (static SPMD shapes; the
   capacity check is returned, not asserted, so the caller can retry
   with a bigger factor),
5. each device sorts what it received; padding (``INT64_MAX``) sorts to
   the tail.

The result is globally sorted across the mesh in device order.  MPI
codes do the same dance with ``MPI_Alltoallv``; here the collective
rides ICI and the shapes are static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_PAD = np.int64(np.iinfo(np.int64).max)


def sharded_key_sort(keys, mesh, *, oversample=64, capacity_factor=2.0):
    """Sort int64 *keys* distributed over the 1D *mesh*.

    :arg keys: (n,) int64, n divisible by the mesh size (pad with
        ``jnp.iinfo(jnp.int64).max`` if needed; padding sorts last).
    :returns: ``(sorted_padded, counts, ok)`` — per-device padded
        sorted shards of shape (nranks, nranks * slot) where ``slot ≈
        capacity_factor * per / nranks`` (per-device memory stays
        O(capacity_factor * n / nranks), NOT O(n)), per-device valid
        counts (nranks,), and a bool scalar that is False iff some
        (device, destination) bucket overflowed its slot (retry with a
        larger factor).  Concatenating ``sorted_padded[d, :counts[d]]``
        over devices yields the globally sorted sequence.
    """
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    n = keys.shape[0]
    if n % nranks:
        raise ValueError(f"n={n} not divisible by nranks={nranks}")
    per = n // nranks
    cap = int(np.ceil(capacity_factor * per / nranks))
    nsamp = min(per, oversample)

    def step(local):
        local = lax.sort(local[0])                     # (per,)

        # splitters from the sorted global sample
        stride = max(1, per // nsamp)
        sample = local[::stride][:nsamp]
        allsamp = lax.sort(lax.all_gather(sample, axis).reshape(-1))
        m = allsamp.shape[0]
        splitters = allsamp[(jnp.arange(1, nranks) * m) // nranks]

        # bucket b = contiguous slice [starts[b], starts[b+1]) of local
        starts = jnp.searchsorted(local, splitters).astype(jnp.int64)
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int64), starts,
             jnp.full(1, per, jnp.int64)])
        lens = starts[1:] - starts[:-1]                # (nranks,)
        ok = (lens <= cap).all()

        # pack buckets into the fixed-capacity send buffer
        j = jnp.arange(cap, dtype=jnp.int64)
        rows = starts[:-1, None] + j[None, :]          # (nranks, cap)
        valid = j[None, :] < lens[:, None]
        send = jnp.where(valid, local[jnp.clip(rows, 0, per - 1)], _PAD)

        recv = lax.all_to_all(send, axis, 0, 0, tiled=False)
        merged = lax.sort(recv.reshape(-1))            # (nranks*cap,)
        count = (merged != _PAD).sum()

        # capacity check must survive across devices
        ok = lax.psum(ok.astype(jnp.int32), axis) == nranks
        return (merged[None, :cap * nranks], count[None], ok[None])

    try:
        from jax import shard_map
    except ImportError:                                # older jax
        from jax.experimental.shard_map import shard_map

    keys = jax.device_put(
        keys.reshape(nranks, per),
        NamedSharding(mesh, P(axis, None)))
    merged, counts, oks = jax.jit(shard_map(
        step, mesh=mesh, in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis), P(axis))))(keys)
    return merged, counts, bool(np.asarray(oks).all())


def sharded_sort_gather(keys, mesh, **kwargs):
    """Convenience: sharded sort + host-side gather of the valid
    entries (for tests / small n)."""
    merged, counts, ok = sharded_key_sort(keys, mesh, **kwargs)
    if not ok:
        kwargs["capacity_factor"] = 2 * kwargs.get("capacity_factor",
                                                   2.0)
        return sharded_sort_gather(keys, mesh, **kwargs)
    merged = np.asarray(merged)
    counts = np.asarray(counts)
    return np.concatenate(
        [merged[d, :counts[d]] for d in range(merged.shape[0])])
