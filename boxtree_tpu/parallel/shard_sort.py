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


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:                                # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map(fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs)


def sharded_key_sort(keys, mesh, *, oversample=64, capacity_factor=2.0,
                     vals=None, num_keys=1):
    """Sort int64 *keys* distributed over the 1D *mesh*.

    :arg keys: (n,) int64, n divisible by the mesh size (pad with
        ``jnp.iinfo(jnp.int64).max`` if needed; padding sorts last).
    :arg vals: optional (n,) int64 payload — or a TUPLE of such —
        carried through the sort (key-value sort; e.g. particle ids, so
        the caller can apply the sort permutation to coordinates).
        Ties keep input order (every constituent ``lax.sort`` is stable
        and buckets travel in rank order).
    :arg num_keys: with ``num_keys=2`` the first *vals* entry acts as a
        SECONDARY sort key (splitters and bucketing still use the
        primary key only — all equal primary keys land in one bucket,
        so the local merge establishes the full (k1, k2) order).
    :returns: ``(sorted_padded, counts, ok)`` — per-device padded
        sorted shards of shape (nranks, nranks * slot) where ``slot ≈
        capacity_factor * per / nranks`` (per-device memory stays
        O(capacity_factor * n / nranks), NOT O(n)), per-device valid
        counts (nranks,), and a bool scalar that is False iff some
        (device, destination) bucket overflowed its slot (retry with a
        larger factor).  Concatenating ``sorted_padded[d, :counts[d]]``
        over devices yields the globally sorted sequence.  With *vals*,
        returns ``(sorted_padded, *vals_padded, counts, ok)``.
    """
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    n = keys.shape[0]
    if n % nranks:
        raise ValueError(f"n={n} not divisible by nranks={nranks}")
    per = n // nranks
    cap = int(np.ceil(capacity_factor * per / nranks))
    nsamp = min(per, oversample)
    if vals is None:
        vals_t = ()
    elif isinstance(vals, (tuple, list)):
        vals_t = tuple(vals)
    else:
        vals_t = (vals,)
    nvals = len(vals_t)
    if num_keys > 1 + nvals:
        raise ValueError("num_keys exceeds 1 + len(vals)")

    def step(local, *lvals):
        srt = lax.sort((local[0], *(v[0] for v in lvals)),
                       num_keys=num_keys)
        local, lvals = srt[0], srt[1:]

        # splitters from the sorted global sample (primary key only)
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
        rows_c = jnp.clip(rows, 0, per - 1)
        send = jnp.where(valid, local[rows_c], _PAD)

        recv = lax.all_to_all(send, axis, 0, 0, tiled=False)
        vrecvs = []
        for v in lvals:
            vsend = jnp.where(valid, v[rows_c], 0)
            vrecvs.append(lax.all_to_all(vsend, axis, 0, 0,
                                         tiled=False).reshape(-1))
        srt = lax.sort((recv.reshape(-1), *vrecvs), num_keys=num_keys)
        merged, mvals = srt[0], srt[1:]
        count = (merged != _PAD).sum()

        # capacity check must survive across devices
        ok = lax.psum(ok.astype(jnp.int32), axis) == nranks
        return (merged[None], *(v[None] for v in mvals),
                count[None], ok[None])

    spec = NamedSharding(mesh, P(axis, None))
    keys = jax.device_put(keys.reshape(nranks, per), spec)
    vals_sh = tuple(
        jax.device_put(jnp.asarray(v).reshape(nranks, per), spec)
        for v in vals_t)
    outs = jax.jit(_shard_map(
        step, mesh, (P(axis, None),) * (1 + nvals),
        tuple([P(axis, None)] * (1 + nvals) + [P(axis), P(axis)])))(
        keys, *vals_sh)
    merged, mvals = outs[0], outs[1:1 + nvals]
    counts, oks = outs[-2], outs[-1]
    ok = bool(np.asarray(oks).all())
    if vals is None:
        return merged, counts, ok
    if nvals == 1 and not isinstance(vals, (tuple, list)):
        return merged, mvals[0], counts, ok
    return merged, mvals, counts, ok


def sharded_rebalance(merged, counts, mesh, *, radius=2, vals=None):
    """Equalize the sample sort's ragged shards to exactly ``n/nranks``
    keys each, preserving global sorted order.

    After :func:`sharded_key_sort`, device ``d`` holds ``counts[d]``
    valid keys; downstream phases (:func:`sharded_leaf_levels`) want
    equal static shards.  Because the data is already globally ordered,
    the key at global position ``p`` belongs to device ``p // per`` —
    a monotone, almost-diagonal redistribution: each device keeps its
    diagonal slice and exchanges only the drift with neighbors within
    ``radius`` ranks (one ``ppermute`` of one contiguous slice per
    offset, O(radius * per) work, no all_to_all).

    :arg merged: (nranks, L) padded sorted shards from the sample sort.
    :arg counts: (nranks,) per-device valid counts; ``sum(counts)``
        must be divisible by nranks.
    :arg vals: optional (nranks, L) payload shards — or a TUPLE of
        such — to carry along.
    :returns: ``(shards, ok)`` — (nranks, per) equalized shards and a
        bool that is False iff some key needed to travel farther than
        *radius* ranks (retry with a larger radius).  With *vals*,
        ``(shards, val_shards, ok)`` (val_shards a tuple iff *vals*
        was).
    """
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    counts_h = np.asarray(counts)
    n = int(counts_h.sum())
    if n % nranks:
        raise ValueError(f"total={n} not divisible by nranks={nranks}")
    per = n // nranks
    big = merged.shape[1]
    if vals is None:
        vals_t = ()
    elif isinstance(vals, (tuple, list)):
        vals_t = tuple(vals)
    else:
        vals_t = (vals,)
    nvals = len(vals_t)
    per64 = np.int64(per)

    def step(buf, cnt, *vbufs):
        buf = buf[0]                                   # (big,)
        c = cnt[0, 0].astype(jnp.int64)
        rank = lax.axis_index(axis).astype(jnp.int64)
        all_c = lax.all_gather(c, axis).astype(jnp.int64)
        off = (jnp.cumsum(all_c) - all_c)[rank]

        # every key of mine must land within `radius` ranks
        first_dest = jnp.where(c > 0, off // per64, rank)
        last_dest = jnp.where(c > 0, (off + c - 1) // per64, rank)
        ok = (first_dest >= rank - radius) & (last_dest <= rank + radius)
        ok = lax.psum(ok.astype(jnp.int32), axis) == nranks

        i = jnp.arange(per, dtype=jnp.int64)
        out = jnp.full(per, _PAD)
        vouts = [jnp.zeros(per, jnp.int64) for _ in range(nvals)]
        bufp = jnp.concatenate([buf, jnp.full(per, _PAD)])
        vbufps = [jnp.concatenate([v[0], jnp.zeros(per, jnp.int64)])
                  for v in vbufs]

        for j in range(-radius, radius + 1):
            t = rank + j                               # my destination
            g0 = jnp.maximum(off, t * per64)
            g1 = jnp.minimum(off + c, (t + 1) * per64)
            ln = jnp.where((t >= 0) & (t < nranks),
                           jnp.maximum(g1 - g0, 0), 0)
            sl = jnp.clip(g0 - off, 0, big)
            seg = lax.dynamic_slice(bufp, (sl,), (per,))
            vsegs = [lax.dynamic_slice(v, (sl,), (per,))
                     for v in vbufps]
            hdr = jnp.stack([g0, ln])
            if j != 0:
                pairs = [(s, s + j) for s in range(nranks)
                         if 0 <= s + j < nranks]
                seg = lax.ppermute(seg, axis, pairs)
                hdr = lax.ppermute(hdr, axis, pairs)
                vsegs = [lax.ppermute(v, axis, pairs) for v in vsegs]
            t0 = hdr[0] - rank * per64
            sel = (i >= t0) & (i < t0 + hdr[1])
            src = jnp.clip(i - t0, 0, per - 1)
            out = jnp.where(sel, seg[src], out)
            vouts = [jnp.where(sel, vseg[src], vout)
                     for vseg, vout in zip(vsegs, vouts)]

        return (out[None], *(v[None] for v in vouts), ok[None])

    spec = NamedSharding(mesh, P(axis, None))
    merged = jax.device_put(merged, spec)
    counts = jax.device_put(jnp.asarray(counts).reshape(nranks, 1),
                            NamedSharding(mesh, P(axis, None)))
    vals_sh = tuple(jax.device_put(v, spec) for v in vals_t)
    outs = jax.jit(_shard_map(
        step, mesh, (P(axis, None),) * (2 + nvals),
        tuple([P(axis, None)] * (1 + nvals) + [P(axis)])))(
        merged, counts, *vals_sh)
    out, vouts, oks = outs[0], outs[1:1 + nvals], outs[-1]
    ok = bool(np.asarray(oks).all())
    if vals is None:
        return out, ok
    if nvals == 1 and not isinstance(vals, (tuple, list)):
        return out, vouts[0], ok
    return out, vouts, ok


def sharded_permute(order, data, mesh, *, capacity_factor=2.0):
    """Apply a distributed permutation to row-sharded *data*.

    After the sharded sort + rebalance, device ``r`` knows ``order[s]``
    (the ORIGINAL index of the particle at global sorted slot ``s``)
    for its slots, while the particle payloads (coordinates, radii,
    weights) still live in original order: device ``q`` owns originals
    ``[q*per, (q+1)*per)``.  This routine materializes
    ``data[order]`` sharded the same way as *order* — the step that
    keeps particle arrays O(n/nranks) per device through the sharded
    tree build instead of gathering them to one host (doc/PERF.md,
    sharded-build design note; the reference redistributes particles
    with ``MPI_Alltoallv`` in `boxtree/distributed/local_tree.py`).

    Pull-based, three fixed-shape hops, all O(capacity_factor * per)
    per device:

    1. each device sorts its ``(order, slot)`` pairs by original index
       and ships each contiguous owner-rank bucket to its owner in one
       fixed-capacity ``all_to_all`` (owner of original ``o`` is
       ``o // per`` — no splitter sampling needed);
    2. the owner gathers the requested rows of its local data block
       (and records ``inverse[o] = s``, the sorted slot of each of its
       originals — the inverse permutation falls out for free);
    3. a mirror ``all_to_all`` returns the rows, which the requester
       unpacks back to slot order.

    :arg order: (n,) int64, a permutation of ``0..n-1``; sharded or
        shardable over the 1D *mesh*.
    :arg data: (n, k) array in original row order (any real dtype).
    :returns: ``(sorted_data, inverse, ok)`` — ``data[order]`` and the
        inverse permutation (both mesh-sharded along rows), and a bool
        that is False iff an owner bucket overflowed the fixed capacity
        (retry with a larger *capacity_factor*; only pathological
        original->sorted skew needs it).
    """
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    n = order.shape[0]
    if n % nranks:
        raise ValueError(f"n={n} not divisible by nranks={nranks}")
    per = n // nranks
    cap = int(np.ceil(capacity_factor * per / nranks))
    k = data.shape[1]
    per64 = np.int64(per)

    def step(ord_s, data_s):
        ord_s = ord_s[0]                               # (per,)
        data_s = data_s[0]                             # (per, k)
        rank = lax.axis_index(axis).astype(jnp.int64)
        j = jnp.arange(per, dtype=jnp.int64)

        # 1. bucket requests by owner rank
        o_sorted, j_sorted = lax.sort((ord_s, j), num_keys=1)
        starts = jnp.searchsorted(
            o_sorted, jnp.arange(nranks, dtype=jnp.int64) * per64
        ).astype(jnp.int64)
        starts = jnp.concatenate(
            [starts, jnp.full(1, per, jnp.int64)])
        lens = starts[1:] - starts[:-1]
        ok = (lens <= cap).all()
        ok = lax.psum(ok.astype(jnp.int32), axis) == nranks

        lane = jnp.arange(cap, dtype=jnp.int64)
        rows = starts[:-1, None] + lane[None, :]       # (nranks, cap)
        valid = lane[None, :] < lens[:, None]
        rows_c = jnp.clip(rows, 0, per - 1)
        req_o = jnp.where(valid, o_sorted[rows_c], _PAD)
        req_s = jnp.where(valid, rank * per64 + j_sorted[rows_c], 0)
        req = jnp.stack([req_o, req_s], axis=-1)       # (nranks, cap, 2)
        req = lax.all_to_all(req, axis, 0, 0, tiled=False)

        # 2. serve: gather my rows; record the inverse permutation
        got_o, got_s = req[..., 0], req[..., 1]
        got_valid = got_o != _PAD
        loc = jnp.clip(got_o - rank * per64, 0, per - 1)
        reply = jnp.where(got_valid[..., None],
                          data_s[loc.reshape(-1)].reshape(
                              nranks, cap, k), 0)
        # pads scatter to distinct out-of-range rows (dropped), keeping
        # the index set genuinely unique
        pad_idx = per + jnp.arange(nranks * cap, dtype=jnp.int64)
        inv_idx = jnp.where(got_valid.reshape(-1), loc.reshape(-1),
                            pad_idx)
        inv = jnp.zeros(per, jnp.int64).at[inv_idx].set(
            got_s.reshape(-1), mode="drop", unique_indices=True)

        # 3. route replies back and unpack to slot order
        reply = lax.all_to_all(reply, axis, 0, 0, tiled=False)
        dest_k = jnp.searchsorted(
            starts[1:], j, side="right").astype(jnp.int64)
        lane_k = j - starts[dest_k]
        val_sorted = reply[dest_k, jnp.clip(lane_k, 0, cap - 1)]
        out = jnp.zeros((per, k), data_s.dtype).at[j_sorted].set(
            val_sorted, unique_indices=True)
        return out[None], inv[None], ok[None]

    spec = NamedSharding(mesh, P(axis, None))
    ord_sh = jax.device_put(
        jnp.asarray(order).reshape(nranks, per), spec)
    data_sh = jax.device_put(
        jnp.asarray(data).reshape(nranks, per, k),
        NamedSharding(mesh, P(axis, None, None)))
    out, inv, oks = jax.jit(_shard_map(
        step, mesh, (P(axis, None), P(axis, None, None)),
        (P(axis, None, None), P(axis, None), P(axis))))(ord_sh, data_sh)
    return out, inv, bool(np.asarray(oks).all())


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
