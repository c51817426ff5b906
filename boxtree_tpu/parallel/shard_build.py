"""Sharded tree-build phase A: leaf-level assignment over a device mesh.

Second building block of the sharded tree build (doc/PERF.md design
note, after the distributed Morton sort in
:mod:`boxtree_tpu.parallel.shard_sort`).  Single-device phase A
(``tree/build.py::_phase_a``) is a bounded level loop of segmented
scans over the Morton-sorted particles; here each device runs the same
scans over its contiguous sorted shard and the only cross-device work
per level is O(nranks):

1. one ``ppermute`` of each shard's last key prefix, so a shard knows
   whether its first particle starts a new box or continues the left
   neighbor's (the reference instead owns this implicitly — every MPI
   rank rebuilds the tree from its full local particle set,
   ``boxtree/distributed/local_tree.py:198-495``);
2. one ``all_gather`` of each shard's (head segment total, tail segment
   total, first prefix, last prefix) summary, from which every shard
   reconstructs the *global* weight of its boundary-spanning boxes: a
   box spanning shards ``a..b`` weighs ``tail(a) + sum(whole shards
   in between) + head(b)``, and a shard strictly inside the span is a
   single segment whose head == tail == its whole weight;
3. one ``psum`` of the per-level non-empty-box count.

The split rule is the reference's exactly (split iff cumulative refine
weight > max, ``boxtree/tree_build_kernels.py:577-611``), so the
sharded leaf levels and per-level box counts agree bitwise with the
single-device ``_phase_a`` — which is the oracle in
``tests/test_shard_build.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from boxtree_tpu.tree.build import _seg_totals


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:                                 # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map(fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs)


def sharded_leaf_levels(codes_s, weights_s, mesh, *, max_weight,
                        dimensions, depth):
    """Adaptive leaf-level assignment over shard-sorted Morton keys.

    :arg codes_s: (n,) int64 globally sorted full-depth Morton keys
        (e.g. the output of ``sharded_key_sort``), n divisible by the
        mesh size.
    :arg weights_s: (n,) refine weights in the same order.
    :returns: ``(leaf_level, counts_and_unfit)`` — per-particle leaf
        levels (n,) in sorted order, and the packed per-level non-empty
        box counts + unfit-particle count, matching the single-device
        ``_phase_a`` bitwise.
    """
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    n = codes_s.shape[0]
    if n % nranks:
        raise ValueError(f"n={n} not divisible by nranks={nranks}")
    per = n // nranks
    max_weight = jnp.asarray(max_weight, jnp.int64)

    def step(codes, w):
        codes = codes[0]                                # (per,)
        w = w[0].astype(jnp.int64)
        rank = lax.axis_index(axis).astype(jnp.int64)

        # left neighbor's last key (device 0 gets a sentinel that can
        # never equal a valid prefix: all-ones)
        left_last = lax.ppermute(
            codes[-1], axis,
            [(i, i + 1) for i in range(nranks - 1)])
        left_last = jnp.where(rank == 0, jnp.int64(-1), left_last)

        cumw = jnp.cumsum(w)
        wtot = cumw[-1]

        def box_weights(level):
            shift = jnp.int64(dimensions) * (jnp.int64(depth) - level)
            pfx = codes >> shift
            left_pfx = jnp.where(left_last < 0, jnp.int64(-1),
                                 left_last >> shift)
            is_start = jnp.concatenate(
                [(pfx[:1] != left_pfx), pfx[1:] != pfx[:-1]])
            # local per-segment totals (scan-only)
            w_loc = _seg_totals(cumw, w, is_start, wtot)

            # boundary fix-up from gathered shard summaries
            first_start = jnp.argmax(is_start)          # 0 if none
            any_start = is_start.any()
            head_end = jnp.where(any_start, first_start, per)
            head_sum = jnp.where(jnp.arange(per) < head_end, w, 0).sum()
            last_start = (per - 1
                          - jnp.argmax(is_start[::-1])) * any_start
            tail_sum = jnp.where(jnp.arange(per) >= last_start,
                                 w, 0).sum()
            summ = jnp.stack([pfx[0], pfx[-1], head_sum, tail_sum,
                              wtot, any_start.astype(jnp.int64)])
            summs = lax.all_gather(summ, axis)          # (nranks, 6)
            g_first, g_last = summs[:, 0], summs[:, 1]
            g_head, g_tail = summs[:, 2], summs[:, 3]
            g_tot, g_any = summs[:, 4], summs[:, 5]

            # the global weight of the box CONTAINING each shard
            # boundary: for my tail segment (prefix pfx[-1]) the total
            # is my tail_sum + every following shard's contribution
            # while its first prefix still equals mine (whole shard if
            # it has no internal start, else just its head).
            ranks = jnp.arange(nranks, dtype=jnp.int64)

            def spanning_total(p, r):
                """Global weight of the segment with prefix *p* that
                touches the boundary of shard *r* (vectorized over the
                gathered summaries; nranks is small)."""
                right = ((ranks > r) & (g_first == p)
                         & (jnp.cumsum(
                             ((ranks > r) & ((g_first != p)
                                             | (g_any == 1))
                              ).astype(jnp.int64))
                            <= (g_any * 0)))
                del right
                # contribution of shards right of r: walk via cumulative
                # "chain unbroken" flags — shard q (> r) contributes its
                # head if g_first[q] == p and every shard between r and q
                # is a single-segment shard with that same prefix.
                after = ranks > r
                link = (g_first == p) & (g_any == 0)    # whole shard in p
                # chain[q] = all shards in (r, q) are full-p shards
                brk = after & ~link
                chain = jnp.cumsum(brk.astype(jnp.int64)) \
                    - jnp.where(brk, 1, 0)
                chain_ok = after & (g_first == p) & (chain == 0)
                right_sum = jnp.where(
                    chain_ok, jnp.where(g_any == 1, g_head, g_tot),
                    0).sum()
                # contribution of shards left of r, symmetric
                before = ranks < r
                brk_l = before & ~link
                chain_l = (jnp.cumsum(brk_l[::-1].astype(jnp.int64))
                           - jnp.where(brk_l[::-1], 1, 0))[::-1]
                chain_ok_l = before & (g_last == p) & (chain_l == 0)
                left_sum = jnp.where(
                    chain_ok_l, jnp.where(g_any == 1, g_tail, g_tot),
                    0).sum()
                return left_sum + right_sum

            my_tail_total = tail_sum + spanning_total(pfx[-1], rank)
            my_head_total = head_sum + spanning_total(pfx[0], rank)

            in_head = jnp.arange(per) < head_end
            in_tail = jnp.arange(per) >= last_start
            # single-segment shard: head == tail == the whole span
            single = ~any_start
            w_glob = jnp.where(
                single, my_tail_total,
                jnp.where(in_tail, my_tail_total,
                          jnp.where(in_head, my_head_total, w_loc)))

            # a start is GLOBAL iff it is a local is_start (position 0
            # already compares against the left neighbor)
            return is_start, w_glob

        counts0 = jnp.zeros(depth + 2, jnp.int64)

        def cond(state):
            level, n_active, _leaf, _counts = state
            return (level <= depth) & (n_active > 0)

        def body(state):
            level, _n_active, leaf_level, counts = state
            active = leaf_level > depth
            is_start, wg = box_weights(level)
            # counts only particles still deciding; boxes are assigned
            # whole (leaf level is a box property), so active is
            # segment-constant
            nonempty = (is_start & active).sum().astype(jnp.int64)
            nonempty = lax.psum(nonempty, axis)
            counts = counts.at[level].set(nonempty)
            done = active & (wg <= max_weight)
            leaf_level = jnp.where(done, level.astype(jnp.int32),
                                   leaf_level)
            n_act = lax.psum(
                (leaf_level > depth).sum().astype(jnp.int64), axis)
            return level + 1, n_act, leaf_level, counts

        # the initial leaf_level must be device-VARYING (the loop body
        # writes shard-local values); derive it from the varying codes
        leaf0 = jnp.where(codes < 0, 0, depth + 1).astype(jnp.int32)
        init = (jnp.int64(0), jnp.int64(per * nranks), leaf0, counts0)
        _, _, leaf_level, counts = lax.while_loop(cond, body, init)
        n_unfit = lax.psum((leaf_level > depth).sum(), axis)
        leaf_level = jnp.minimum(leaf_level, depth)
        return (leaf_level[None],
                jnp.concatenate([counts,
                                 n_unfit.astype(jnp.int64)[None]])[None])

    codes_sh = jax.device_put(codes_s.reshape(nranks, per),
                              NamedSharding(mesh, P(axis, None)))
    w_sh = jax.device_put(
        jnp.asarray(weights_s).reshape(nranks, per),
        NamedSharding(mesh, P(axis, None)))
    leaf, counts = jax.jit(_shard_map(
        step, mesh,
        (P(axis, None), P(axis, None)),
        (P(axis, None), P(axis, None))))(codes_sh, w_sh)
    return leaf.reshape(-1), np.asarray(counts)[0]
