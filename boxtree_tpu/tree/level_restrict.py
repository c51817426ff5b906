"""2:1 level restriction for adaptive trees.

Makes neighboring leaves differ by at most one level (the
'adaptive-level-restricted' tree kind, ``boxtree/tree.py:9-18``).  The
reference runs a per-level force-split upward sweep inside its build loop
(``boxtree/tree_build_kernels.py:825-915``, driven at
``boxtree/tree_build.py:1145-1224``); here the whole restriction acts on
the *per-particle leaf-level array* of the sort-based build:

1. Downward demand pass (deepest level first): every leaf box at level
   ``m`` demands that the parent-level cells touching it be refined to at
   least level ``m-1``.  A demand is a range-update on the Morton-sorted
   particle array (each cell's subtree is one contiguous key range), and
   all demands of a level are applied with one +1/-1 scatter and a
   cumulative sum.
2. Consistency sweep: if any particle in a box descends, every particle
   in that box must descend (a box splits as a whole) — enforced with
   per-level segment reductions.
3. Repeat to fixpoint (host-checked flag; converges in a handful of
   rounds since leaf levels only increase and are bounded by the depth).

Note: the reference restricts the *pre-pruning* tree (empty sibling boxes
included); since the sort-based build never materializes empty boxes, the
restriction here constrains non-empty leaves only — the post-pruning
invariant checked by the reference's tests (``test/test_tree.py:904-974``)
is the same.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from boxtree_tpu.traversal.build import _offsets
from boxtree_tpu.ops import morton


@partial(jax.jit, static_argnames=("dimensions", "depth", "max_level"))
def _restrict_pass(codes_s, leaf_level, *, dimensions, depth, max_level):
    n = codes_s.shape[0]
    d = dimensions
    offs = jnp.asarray(_offsets(d, 1))            # (3^d, d) incl. zero
    leaf_in = leaf_level

    # {{{ downward demand pass

    for m in range(max_level, 1, -1):
        shift = d * (depth - m)
        is_m_leaf = leaf_level == m
        cells = morton.deinterleave(codes_s >> jnp.int64(shift), d)
        marks = jnp.zeros(n + 1, jnp.int32)
        nb = jnp.int64(1) << jnp.int64(m)
        pshift = jnp.int64(d * (depth - (m - 1)))
        for i in range(offs.shape[0]):
            nc = cells + offs[i][:, None]
            in_range = ((nc >= 0) & (nc < nb)).all(axis=0)
            valid = is_m_leaf & in_range
            q = morton.interleave(jnp.clip(nc, 0, nb - 1) >> jnp.int64(1))
            lo = jnp.searchsorted(codes_s, q << pshift)
            hi = jnp.searchsorted(codes_s, (q + 1) << pshift)
            marks = marks.at[jnp.where(valid, lo, n + 0 * lo)].add(
                1, mode="drop")
            marks = marks.at[jnp.where(valid, hi, n + 0 * hi)].add(
                -1, mode="drop")

            # A demanded cell with no particles of its own may still lie
            # inside a coarser non-empty leaf (whose particles sit outside
            # the demand range).  That leaf must split too — by one level
            # per fixpoint round, so refinement stays minimal: once the
            # region covering the demanded cell is particle-free, no leaf
            # touches the fine box there and splitting stops.
            empty = valid & (lo == hi)
            for cand in (lo - 1, lo):
                ok = empty & (cand >= 0) & (cand < n)
                pc = jnp.clip(cand, 0, n - 1)
                t_p = leaf_level[pc].astype(jnp.int64)
                q_anc = q >> (jnp.int64(d) * (jnp.int64(m - 1) - t_p))
                p_pfx = codes_s[pc] >> (jnp.int64(d)
                                        * (jnp.int64(depth) - t_p))
                contains = (t_p <= m - 2) & (q_anc == p_pfx)
                upd = ok & contains
                leaf_level = leaf_level.at[
                    jnp.where(upd, pc, n)].max(
                        (t_p + 1).astype(leaf_level.dtype), mode="drop")
        covered = jnp.cumsum(marks[:-1]) > 0
        leaf_level = jnp.where(covered & (leaf_level < m - 1),
                               m - 1, leaf_level)

    # }}}

    # {{{ consistency sweep: a box splits as a whole

    iota = jnp.arange(n, dtype=jnp.int64)
    for t in range(max_level):
        pfx = codes_s >> jnp.int64(d * (depth - t))
        active = leaf_level >= t
        prev_active = jnp.concatenate([jnp.zeros(1, bool), active[:-1]])
        diff = jnp.concatenate([jnp.ones(1, bool), pfx[1:] != pfx[:-1]])
        is_start = active & (diff | ~prev_active)
        start_idx = jnp.where(is_start, iota, jnp.int64(0))
        lo = jax.lax.cummax(start_idx)
        boundary = is_start | ~active
        nxt = jnp.where(boundary, iota, jnp.int64(n))
        suf = jax.lax.cummin(nxt[::-1])[::-1]
        hi = jnp.concatenate([suf[1:], jnp.full((1,), n, jnp.int64)])
        deeper = jnp.concatenate(
            [jnp.zeros(1, jnp.int64),
             jnp.cumsum((leaf_level > t).astype(jnp.int64))])
        has_deeper = (deeper[hi] - deeper[lo]) > 0
        leaf_level = jnp.where(active & (leaf_level == t) & has_deeper,
                               t + 1, leaf_level)

    # }}}

    changed = jnp.any(leaf_level != leaf_in)
    return leaf_level, changed


@partial(jax.jit, static_argnames=("dimensions", "depth", "max_level"))
def _recount_boxes(codes_s, leaf_level, *, dimensions, depth, max_level):
    n = codes_s.shape[0]
    counts = jnp.zeros(depth + 2, jnp.int64)
    for level in range(max_level + 1):
        pfx = codes_s >> jnp.int64(dimensions * (depth - level))
        active = leaf_level >= level
        prev_active = jnp.concatenate([jnp.zeros(1, bool), active[:-1]])
        diff = jnp.concatenate([jnp.ones(1, bool), pfx[1:] != pfx[:-1]])
        is_start = active & (diff | ~prev_active)
        counts = counts.at[level].set(jnp.sum(is_start))
    return counts


def restrict_leaf_levels(codes_s, leaf_level, *, dimensions, depth,
                         max_level):
    """Raise per-particle leaf levels until the 2:1 constraint holds.

    :arg max_level: deepest occupied level (host int) — restriction never
        deepens the tree, so kernels only unroll this many levels.
    :returns: ``(leaf_level, counts)`` with per-level box counts
        recomputed.
    """
    for _ in range(max_level + 1):
        leaf_level, changed = _restrict_pass(
            codes_s, leaf_level, dimensions=dimensions, depth=depth,
            max_level=max_level)
        if not bool(changed):
            break
    counts = _recount_boxes(codes_s, leaf_level, dimensions=dimensions,
                            depth=depth, max_level=max_level)
    return leaf_level, np.asarray(jax.device_get(counts))
