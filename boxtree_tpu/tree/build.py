"""Sort-based, TPU-native adaptive tree build.

Algorithm (an idiomatic-XLA redesign of ``boxtree/tree_build.py:145-1878``):

1. Encode every particle's full-depth Morton key and sort once
   (``jax.lax.sort``).  The reference instead re-sorts particles into child
   boxes once per level (``boxtree/tree_build_kernels.py:717-819``); after a
   full-depth sort that per-level renumbering is already implied by key
   prefixes, so the level loop needs no data movement at all.
2. A bounded ``lax.while_loop`` over levels assigns every particle its
   *leaf level*: the first level at which the cumulative refine weight of
   its (prefix-defined) box drops to ``max_leaf_refine_weight`` or below.
   This reproduces the reference's split rule exactly
   (``boxtree/tree_build_kernels.py:577-611``: split iff overfull, i.e.
   leaf iff weight <= max), and per-level box *counts* fall out of the same
   loop — so the box arrays can then be allocated exactly, with no
   realloc-and-restart protocol (``boxtree/tree_build.py:914-1006``).
3. A second (statically unrolled, ``nlevels`` trips) pass materializes the
   per-box arrays with vectorized segmented scans and scatters: box Morton
   prefixes, levels, particle ranges, parent/child links, centers, flags.

Boxes are numbered level-major and Morton-ordered within each level,
matching the reference's post-prune numbering.  Empty boxes are never
created (equivalent to the reference's empty-leaf pruning,
``boxtree/tree_build.py:1328-1457``); ``skip_prune`` is not supported.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from boxtree_tpu import config
from boxtree_tpu.ops import morton
from boxtree_tpu.tree.containers import Tree, box_flags_enum

logger = logging.getLogger(__name__)


class MaxLevelsExceeded(RuntimeError):
    """Raised when the tree would need more levels than Morton keys can
    represent (mirrors ``boxtree/tree_build.py:79``)."""


_TREE_KINDS = ("adaptive", "adaptive-level-restricted", "non-adaptive")


# {{{ phase A: sort + leaf-level assignment

def _prefix_segments(pfx, n):
    """Contiguous equal-prefix segment bounds ``[lo, hi)`` per particle
    (prefix-only — active masking happens through masked cumsums)."""
    iota = jnp.arange(n, dtype=jnp.int64)
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), pfx[1:] != pfx[:-1]])
    lo = lax.cummax(jnp.where(is_start, iota, jnp.int64(0)))
    nxt = jnp.where(is_start, iota, jnp.int64(n))
    suf = lax.cummin(nxt[::-1])[::-1]
    hi = jnp.concatenate([suf[1:], jnp.full((1,), n, jnp.int64)])
    return is_start, lo, hi


_SEG_BIG = jnp.int64(1) << 62


def _seg_totals(cum_incl, vals, is_start, total):
    """Per-particle total of *vals* over its equal-prefix segment, using
    scans only (TPU: data-dependent gathers cost ~20ns/elem, scans ~2ns).
    The exclusive cumsum at segment starts is monotone, so a reverse
    ``cummin`` of the marked values finds the *next* segment's start
    exactly."""
    excl = cum_incl - vals
    base = lax.cummax(jnp.where(is_start, excl, jnp.int64(-1)))
    marked = jnp.where(is_start, excl, _SEG_BIG)
    nxt = lax.cummin(marked, reverse=True)        # min over k >= i
    nxt = jnp.concatenate([nxt[1:], jnp.full(1, _SEG_BIG)])  # k > i
    return jnp.minimum(nxt, total) - base


def _stick_levels(coords, radii, bbox_min, root_extent, *, dimensions,
                  depth, extent_norm, stick_out_factor):
    """Deepest level at which every particle (with its radius) still fits
    inside its cell, given the stick-out allowance.  Mirrors the
    descent-stop tests of ``boxtree/tree_build_kernels.py:388-438``."""
    cells = morton.cells_from_coords(coords, bbox_min, root_extent, depth)
    stick = jnp.zeros(coords.shape[1], jnp.int32)
    ok = jnp.ones(coords.shape[1], bool)
    for lev in range(1, depth + 1):
        size = root_extent / (1 << lev)
        centers = (bbox_min[:, None]
                   + (cells >> jnp.int64(depth - lev)).astype(coords.dtype)
                   * size + size / 2)
        sor = (1 + stick_out_factor) * (size / 2)
        if extent_norm == "linf":
            fits = ((coords + radii < centers + sor)
                    & (coords - radii >= centers - sor)).all(axis=0)
        else:   # l2 (boxtree/tree_build_kernels.py:406-428)
            dist = jnp.sqrt(((coords - centers) ** 2).sum(axis=0)) + radii
            fits = dist * dist < dimensions * sor * sor
        ok = ok & fits
        stick = stick + ok.astype(jnp.int32)
    return stick


@partial(jax.jit,
         static_argnames=("dimensions", "depth", "adaptive", "use_bbox",
                          "has_extents", "extent_norm"))
def _phase_a(coords, weights, radii, bbox_min_in, root_extent_in,
             max_weight, stick_out_factor,
             *, dimensions, depth, adaptive, use_bbox, has_extents,
             extent_norm):
    """Morton sort + leaf-level assignment + per-level box counts.

    :returns: ``(codes_s, order, leaf_level, counts, n_unfit, bbox_min,
        root_extent)``.  ``counts[l]`` is the number of (non-empty) boxes
        at level ``l``; ``n_unfit`` is the number of particles whose box is
        still overfull at the maximum representable depth (0 in a
        successful build).

    The square, stretched bounding box (``boxtree/tree_build.py:456-510``)
    is computed on device unless ``use_bbox`` requests the explicit one.
    With extents, a particle additionally stops descending at the deepest
    level whose (stick-out-enlarged) cell still contains it — the
    reference's per-particle "nonchild" stop
    (``tree_build_kernels.py:388-452``) — and stopped particles no longer
    contribute to split decisions.
    """
    n = coords.shape[1]
    if use_bbox:
        bbox_min = bbox_min_in
        root_extent = root_extent_in
    else:
        lo = jnp.min(coords - (radii if has_extents else 0), axis=1)
        hi = jnp.max(coords + (radii if has_extents else 0), axis=1)
        bbox_min = lo
        root_extent = (jnp.max(hi - lo)
                       * (1 + config.ROOT_EXTENT_STRETCH_FACTOR))
    codes = morton.encode_points(coords, bbox_min, root_extent, depth)

    iota32 = jnp.arange(n, dtype=jnp.int32)
    iota_bits = max(1, int(n - 1).bit_length())
    if dimensions * depth + iota_bits <= 63:
        # pack the tie-break index into the key's low bits: ONE
        # key-only int64 sort (~6.6 ns/elem) instead of the key-value
        # sort (~33 ns/elem, doc/PERF.md primitive table).  Identical
        # result: lexicographic (codes, iota) order either way.
        packed = lax.sort((codes << jnp.int64(iota_bits))
                          | iota32.astype(jnp.int64))
        codes_s = packed >> jnp.int64(iota_bits)
        order = (packed
                 & ((jnp.int64(1) << jnp.int64(iota_bits)) - 1)
                 ).astype(jnp.int32)
    else:
        codes_s, order = lax.sort((codes, iota32), num_keys=1)

    w_s = weights[order].astype(jnp.int64)
    if has_extents:
        stick_s = _stick_levels(
            coords, radii, bbox_min, root_extent, dimensions=dimensions,
            depth=depth, extent_norm=extent_norm,
            stick_out_factor=stick_out_factor)[order]
    else:
        stick_s = jnp.full(n, depth + 1, jnp.int32)

    max_weight = jnp.asarray(max_weight, jnp.int64)

    cumw_full = jnp.cumsum(w_s)        # hoisted for the no-extent path

    def box_weights(level, active):
        shift = jnp.int64(dimensions) * (jnp.int64(depth) - level)
        pfx = codes_s >> shift
        is_start = jnp.concatenate(
            [jnp.ones(1, bool), pfx[1:] != pfx[:-1]])
        if has_extents:
            # split decision counts only particles still able to descend
            wm = jnp.where(active & (stick_s > level), w_s, 0)
            cw = jnp.cumsum(wm)
            w = _seg_totals(cw, wm, is_start, cw[-1])
            am = active.astype(jnp.int64)
            ca = jnp.cumsum(am)
            n_active = _seg_totals(ca, am, is_start, ca[-1])
            nonempty_start = is_start & (n_active > 0)
        else:
            # particles of a box are assigned together, so a segment is
            # all-active or all-assigned, and never empty: one hoisted
            # cumsum serves every level, and scans (not gathers) spread
            # the segment totals
            w = _seg_totals(cumw_full, w_s, is_start, cumw_full[-1])
            nonempty_start = is_start & active
        return nonempty_start, w

    counts0 = jnp.zeros(depth + 2, jnp.int64)

    if adaptive:
        def cond(state):
            level, assigned, _leaf_level, _counts = state
            return (level <= depth) & jnp.any(~assigned)

        def body(state):
            level, assigned, leaf_level, counts = state
            active = ~assigned
            nonempty_start, w = box_weights(level, active)
            counts = counts.at[level].set(jnp.sum(nonempty_start))
            done = active & ((w <= max_weight)
                             | (stick_s <= level))
            leaf_level = jnp.where(done, level.astype(jnp.int32), leaf_level)
            return level + 1, assigned | done, leaf_level, counts

        init = (jnp.int64(0), jnp.zeros(n, bool),
                jnp.full(n, depth, jnp.int32), counts0)
        _, assigned, leaf_level, counts = lax.while_loop(cond, body, init)
        n_unfit = jnp.sum(~assigned)
    else:
        # Non-adaptive: uniform depth = first level at which no box is
        # overfull (reference: every box splits while any is overfull,
        # boxtree/tree_build_kernels.py:580-591 with adaptive=False).
        def cond(state):
            level, found, _d_used, _counts = state
            return (level <= depth) & ~found

        def body(state):
            level, found, d_used, counts = state
            active = jnp.ones(n, bool)
            nonempty_start, w = box_weights(level, active)
            counts = counts.at[level].set(jnp.sum(nonempty_start))
            all_ok = jnp.all(w <= max_weight)
            d_used = jnp.where(~found & all_ok, level.astype(jnp.int32),
                               d_used)
            return level + 1, found | all_ok, d_used, counts

        init = (jnp.int64(0), jnp.asarray(False),
                jnp.int32(depth), counts0)
        _, found, d_used, counts = lax.while_loop(cond, body, init)
        leaf_level = jnp.full(n, d_used, jnp.int32)
        n_unfit = jnp.where(found, 0, n).astype(jnp.int64)
        # levels beyond d_used were never visited; counts already 0 there

    # pack counts and the overfull-particle count into one array so the
    # host needs a single device->host transfer
    counts_and_unfit = jnp.concatenate(
        [counts, n_unfit.astype(jnp.int64)[None]])
    return codes_s, order, leaf_level, counts_and_unfit, bbox_min, root_extent

# }}}


# {{{ phase B: materialize box arrays

def _exclusive_cumsum(x):
    return jnp.concatenate(
        [jnp.zeros(1, x.dtype), jnp.cumsum(x)])


@partial(jax.jit, static_argnames=(
    "dimensions", "depth", "level_starts", "cap", "nsources", "ntargets",
    "sources_are_targets", "has_extents"))
def _phase_b(codes_s, order, leaf_level, merged_coords,
             bbox_min, root_extent,
             *, dimensions, depth, level_starts, cap, nsources, ntargets,
             sources_are_targets, has_extents):
    nlevels = len(level_starts) - 1
    d = dimensions
    n = codes_s.shape[0]
    nchild = 2 ** d
    coord_dtype = merged_coords.dtype

    if has_extents:
        # Re-sort so that every box's own (nonchild) particles precede its
        # descendants' ranges: key = (Morton code with bits below the leaf
        # level zeroed, leaf level).  See the module docstring; this makes
        # each box's subtree a contiguous range with nonchild first
        # (mirrors the particle ordering invariant of
        # boxtree/tree_build_kernels.py:1013-1164).
        shift_bits = (jnp.int64(d)
                      * (jnp.int64(depth) - leaf_level.astype(jnp.int64)))
        masked = (codes_s >> shift_bits) << shift_bits
        masked, leaf_level, codes_s, order = lax.sort(
            (masked, leaf_level, codes_s, order), num_keys=2)
        codes_s = masked

    box_morton = jnp.zeros(cap, jnp.int64)
    box_level = jnp.zeros(cap, jnp.int32)
    box_start = jnp.zeros(cap, jnp.int64)
    box_count_cumul = jnp.zeros(cap, jnp.int64)
    box_count_nonchild = jnp.zeros(cap, jnp.int64)
    box_has_children = jnp.zeros(cap, bool)
    box_parent = jnp.zeros(cap, jnp.int32)
    box_child = jnp.zeros((nchild, cap), jnp.int32)
    box_centers = jnp.zeros((d, cap), coord_dtype)

    prev_box = jnp.zeros(n, jnp.int32)
    leaf_box = jnp.zeros(n, jnp.int32)

    # Per level: detect box starts among active particles, scatter only
    # the (small) per-box representative-particle indices, then *gather*
    # every per-box field at those representatives into the statically
    # sliced level segment.  (No full-length scatters, no cummax/cummin
    # scans — both are slow on TPU.)
    #
    # Per-level segment structure from ONE elementwise precomputation
    # (no-extent case): particle i starts a level-L box exactly for the
    # levels in (thr[i], leaf_level[i]], where
    #   thr[i] = min(lcp_level[i], leaf_level[i-1])
    # (lcp_level = deepest level at which i shares its Morton prefix
    # with i-1; a start is "prefix changed OR predecessor inactive").
    # All particles inside an existing level-L box's cell are active —
    # an inactive one would sit in an ancestor leaf covering the cell,
    # contradicting the box's existence — so the box's subtree range
    # ends at the next position with lcp_level < L (one reverse cummin
    # per level) and its counts are pure index differences, replacing
    # the per-level full-length cumsums.  With extents the re-sorted
    # particle order puts nonchild particles inside internal boxes, so
    # that argument fails and the cumsum formulation stays.
    iota64 = jnp.arange(n, dtype=jnp.int64)
    if not has_extents:
        xor = jnp.concatenate(
            [jnp.full(1, -1, jnp.int64),             # sentinel: lcp -1
             codes_s[1:] ^ codes_s[:-1]])
        bl = 64 - lax.clz(xor)                       # xor<0 -> bl 64
        lcp_level = (jnp.int64(depth)
                     - (bl + jnp.int64(d) - 1) // jnp.int64(d))
        prev_leaf = jnp.concatenate(
            [jnp.full(1, -1, jnp.int32), leaf_level[:-1]]
            ).astype(jnp.int64)
        thr = jnp.minimum(lcp_level, prev_leaf)
        leaf64 = leaf_level.astype(jnp.int64)
    else:
        # active-particle prefix counts telescope across levels:
        # cumsum(leaf > L) == cumsum(leaf >= L+1), so each level's
        # "deeper" cumsum carries forward as the next level's "active"
        cum_ge = jnp.arange(n + 1, dtype=jnp.int64)
    for level in range(nlevels):
        b0, b1 = level_starts[level], level_starts[level + 1]
        nl = b1 - b0
        if has_extents:
            cum_gt = _exclusive_cumsum(
                (leaf_level > level).astype(jnp.int32)).astype(jnp.int64)
        if nl == 0:
            if has_extents:
                cum_ge = cum_gt
            continue
        shift = d * (depth - level)
        active = leaf_level >= level
        if has_extents:
            pfx = codes_s >> jnp.int64(shift)
            prev_active = jnp.concatenate(
                [jnp.zeros(1, bool), active[:-1]])
            diff = jnp.concatenate(
                [jnp.ones(1, bool), pfx[1:] != pfx[:-1]])
            is_start = active & (diff | ~prev_active)
        else:
            is_start = (leaf64 >= level) & (thr < level)
        seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1

        # representative (first) particle of each level-L box.  Box-rich
        # levels: compact the start positions with ONE key-only int32
        # sort (~6 ns/elem over n); box-poor levels: binary search
        # (~log2(n) gathers per box, ~19 ns each).  The crossover is
        # nl*log2(n)*19 vs n*6 — the searchsorted-everywhere version
        # dominated phase_b at 1e7 (doc/PERF.md).
        if nl * 24 * 3 > n:
            reps_l = lax.sort(
                jnp.where(is_start, jnp.arange(n, dtype=jnp.int32),
                          jnp.int32(n)))[:nl].astype(jnp.int64)
        else:
            reps_l = jnp.searchsorted(
                seg_id, jnp.arange(nl, dtype=jnp.int32), side="left"
                ).astype(jnp.int64)

        if has_extents:
            nxt_l = jnp.concatenate(
                [reps_l[1:], jnp.full(1, n, jnp.int64)])
            cumul_l = cum_ge[nxt_l] - cum_ge[reps_l]
            deeper_l = cum_gt[nxt_l] - cum_gt[reps_l]
        else:
            # subtree end: next position whose prefix changes at or
            # above this level
            bnd = jnp.where(lcp_level < level, iota64, jnp.int64(n))
            suffmin = jnp.concatenate(
                [lax.cummin(bnd[::-1])[::-1][1:],
                 jnp.full(1, n, jnp.int64)])
            hi_l = suffmin[reps_l]
            cumul_l = hi_l - reps_l
            deeper_l = jnp.where(
                leaf_level[reps_l] > level, cumul_l, 0)

        pfx_l = codes_s[reps_l] >> jnp.int64(shift)
        box_morton = box_morton.at[b0:b1].set(pfx_l)
        box_level = box_level.at[b0:b1].set(level)
        box_start = box_start.at[b0:b1].set(reps_l)
        box_count_cumul = box_count_cumul.at[b0:b1].set(cumul_l)
        box_count_nonchild = box_count_nonchild.at[b0:b1].set(
            cumul_l - deeper_l)
        box_has_children = box_has_children.at[b0:b1].set(deeper_l > 0)

        cells = morton.deinterleave(pfx_l, d)
        inv_size = jnp.asarray(root_extent, coord_dtype) / (1 << level)
        centers = (bbox_min[:, None].astype(coord_dtype)
                   + (cells.astype(coord_dtype) + 0.5) * inv_size)
        box_centers = box_centers.at[:, b0:b1].set(centers)

        if level > 0:
            parent_l = prev_box[reps_l]
            box_parent = box_parent.at[b0:b1].set(parent_l)
            digit_l = (pfx_l & (nchild - 1)).astype(jnp.int32)
            box_child = box_child.at[digit_l, parent_l].set(
                (b0 + jnp.arange(nl, dtype=jnp.int64)).astype(jnp.int32))

        box_of_cur = jnp.where(active, b0 + seg_id, prev_box).astype(
            jnp.int32)
        leaf_box = jnp.where(leaf_level == level, box_of_cur, leaf_box)
        prev_box = box_of_cur
        if has_extents:
            cum_ge = cum_gt

    # {{{ source/target split

    if sources_are_targets:
        is_source_s = jnp.ones(n, bool)
    else:
        is_source_s = order < nsources

    cumsrc = _exclusive_cumsum(is_source_s.astype(jnp.int64))
    box_source_starts = cumsrc[box_start]
    box_source_counts_cumul = (
        cumsrc[box_start + box_count_cumul] - box_source_starts)
    box_source_counts_nonchild = (
        cumsrc[box_start + box_count_nonchild] - box_source_starts)

    pid = config.particle_id_dtype
    if sources_are_targets:
        # every particle is a source in sorted order: the compaction
        # scatters collapse to identities
        user_source_ids = order.astype(pid)
        box_id_of_source = leaf_box
        sources = merged_coords[:, user_source_ids]
    else:
        pos_src = cumsrc[:-1]
        src_scatter = jnp.where(is_source_s, pos_src, nsources)
        user_source_ids = jnp.zeros(nsources, pid).at[src_scatter].set(
            order.astype(pid), mode="drop", unique_indices=True)
        box_id_of_source = jnp.zeros(nsources, jnp.int32).at[
            src_scatter].set(leaf_box, mode="drop", unique_indices=True)
        sources = merged_coords[:, user_source_ids]

    if sources_are_targets:
        box_target_starts = box_source_starts
        box_target_counts_cumul = box_source_counts_cumul
        box_target_counts_nonchild = box_source_counts_nonchild
        targets = sources
        box_id_of_target = box_id_of_source
        # user target id -> tree order position (inverse permutation):
        # pack (order, iota) into ONE int64 and key-sort — 6.6 ns/elem
        # vs 33 for the k/v sort vs 150 for the random scatter
        # (doc/PERF.md primitive table; ids < 2^31 so the pack is exact)
        packed = ((order.astype(jnp.int64) << np.int64(32))
                  | jnp.arange(n, dtype=jnp.int64))
        sorted_target_ids = (lax.sort(packed)
                             & np.int64(0xFFFFFFFF)).astype(pid)
    else:
        is_target_s = ~is_source_s
        cumtgt = _exclusive_cumsum(is_target_s.astype(jnp.int64))
        box_target_starts = cumtgt[box_start]
        box_target_counts_cumul = (
            cumtgt[box_start + box_count_cumul] - box_target_starts)
        box_target_counts_nonchild = (
            cumtgt[box_start + box_count_nonchild] - box_target_starts)

        pos_tgt = cumtgt[:-1]
        tgt_scatter = jnp.where(is_target_s, pos_tgt, ntargets)
        user_target_id = order - nsources
        user_target_ids = jnp.zeros(ntargets, pid).at[tgt_scatter].set(
            user_target_id.astype(pid), mode="drop", unique_indices=True)
        sorted_target_ids = jnp.zeros(ntargets, pid).at[
            jnp.where(is_target_s, user_target_id, ntargets)].set(
                pos_tgt.astype(pid), mode="drop", unique_indices=True)
        box_id_of_target = jnp.zeros(ntargets, jnp.int32).at[
            tgt_scatter].set(leaf_box, mode="drop", unique_indices=True)
        targets = merged_coords[:, nsources + user_target_ids]

    # }}}

    # {{{ box flags (rules mirror boxtree/tree_build_kernels.py:1210-1305)

    # HAS_*_CHILD_BOXES is set only when the child subtrees actually carry
    # particles of that kind (child-subtree count = cumul - nonchild).
    flags = jnp.where(
        box_has_children
        & (box_source_counts_cumul > box_source_counts_nonchild),
        box_flags_enum.HAS_SOURCE_CHILD_BOXES, 0).astype(jnp.int32)
    flags = flags | jnp.where(
        box_has_children
        & (box_target_counts_cumul > box_target_counts_nonchild),
        box_flags_enum.HAS_TARGET_CHILD_BOXES, 0)
    flags = flags | jnp.where(
        box_source_counts_nonchild > 0, box_flags_enum.IS_SOURCE_BOX, 0)
    flags = flags | jnp.where(
        box_target_counts_nonchild > 0, box_flags_enum.IS_TARGET_BOX, 0)
    # Extension: IS_LEAF_BOX maintained for particle trees too.
    flags = flags | jnp.where(
        ~box_has_children, box_flags_enum.IS_LEAF_BOX, 0)

    # }}}

    return dict(
        box_morton=box_morton,
        box_level=box_level,
        box_start=box_start,
        box_parent=box_parent,
        box_child=box_child,
        box_centers=box_centers,
        box_flags=flags,
        box_source_starts=box_source_starts.astype(pid),
        box_source_counts_cumul=box_source_counts_cumul.astype(pid),
        box_source_counts_nonchild=box_source_counts_nonchild.astype(pid),
        box_target_starts=box_target_starts.astype(pid),
        box_target_counts_cumul=box_target_counts_cumul.astype(pid),
        box_target_counts_nonchild=box_target_counts_nonchild.astype(pid),
        user_source_ids=user_source_ids,
        sorted_target_ids=sorted_target_ids,
        sources=sources,
        targets=targets,
        box_id_of_source=box_id_of_source,
        box_id_of_target=box_id_of_target,
    )

# }}}


@partial(jax.jit, static_argnames=("lsb",))
def _box_extents(coords, radii, box_of_particle, box_centers, parents,
                 *, lsb):
    """Per-box particle(+radius) bounding boxes, combined bottom-up
    (mirrors ``boxtree/tree_build_kernels.py:1311-1399``).  Empty boxes
    reflect their center."""
    nboxes = lsb[-1]
    bmin = box_centers.copy()
    bmax = box_centers.copy()
    r = radii if radii is not None else 0.0
    bmin = bmin.at[:, box_of_particle].min(coords - r)
    bmax = bmax.at[:, box_of_particle].max(coords + r)
    nlevels = len(lsb) - 1
    for lev in range(nlevels - 1, 0, -1):
        ids = jnp.arange(lsb[lev], lsb[lev + 1])
        par = parents[ids]
        bmin = bmin.at[:, par].min(bmin[:, ids])
        bmax = bmax.at[:, par].max(bmax[:, ids])
    return bmin, bmax


# {{{ host driver

def _as_coord_array(particles):
    """Accept either a ``(d, n)`` array or a sequence of ``(n,)`` arrays."""
    if isinstance(particles, (list, tuple)) or (
            isinstance(particles, np.ndarray) and particles.dtype == object):
        return jnp.stack([jnp.asarray(p) for p in particles])
    arr = jnp.asarray(particles)
    if arr.ndim != 2:
        raise ValueError("particles must be (dimensions, nparticles)")
    return arr


def _validate_bbox(bbox, dimensions, coord_dtype):
    """Validate an explicitly-given square bounding box
    (mirrors ``boxtree/tree_build.py:476-510``)."""
    bbox = np.asarray(bbox, dtype=coord_dtype)
    if bbox.shape != (dimensions, 2):
        raise ValueError("bbox must have shape (dimensions, 2)")
    bbox_min = bbox[:, 0].copy()
    bbox_max = bbox[:, 1]
    exts = bbox_max - bbox_min
    if not np.allclose(exts, exts[0], rtol=1e-14, atol=0):
        raise ValueError("bbox must be square")
    return np.asarray(bbox_min, coord_dtype), float(exts[0])


def build_tree(particles, kind="adaptive", max_particles_in_box=None,
               targets=None, source_radii=None, target_radii=None,
               stick_out_factor=None, refine_weights=None,
               max_leaf_refine_weight=None, extent_norm=None,
               bbox=None, debug=False, **kwargs):
    """Build a :class:`boxtree_tpu.Tree` of *particles*.

    API mirrors ``TreeBuilder.__call__`` (``boxtree/tree_build.py:145-214``);
    see there for argument semantics.  There is no array-context argument —
    all computation runs under JAX on the default device.
    """
    # tolerate the reference's OpenCL-era no-op kwargs, but reject
    # anything else so a typo'd option can't silently vanish
    for benign in ("wait_for", "allocator", "queue"):
        kwargs.pop(benign, None)
    if kwargs:
        raise TypeError(
            f"build_tree() got unexpected keyword argument(s): "
            f"{', '.join(sorted(kwargs))}")
    if kind not in _TREE_KINDS:
        raise ValueError(f"unknown tree kind: '{kind}'")

    coords = _as_coord_array(particles)
    dimensions, nsources = coords.shape
    coord_dtype = coords.dtype
    sources_are_targets = targets is None

    sources_have_extent = source_radii is not None
    targets_have_extent = target_radii is not None
    has_extents = sources_have_extent or targets_have_extent
    if has_extents:
        if targets is None:
            raise ValueError(
                "must specify targets when specifying any kind of radii")
        if kind != "adaptive":
            raise NotImplementedError(
                "extents currently require kind='adaptive'")
        if extent_norm is None:
            extent_norm = "linf"
        if extent_norm not in ("linf", "l2"):
            raise ValueError(f"unexpected extent_norm: {extent_norm}")
    if stick_out_factor is None:
        stick_out_factor = 0.0

    if targets is not None:
        tgt_coords = _as_coord_array(targets)
        if tgt_coords.dtype != coord_dtype:
            raise TypeError("sources and targets must have the same dtype")
        ntargets = tgt_coords.shape[1]
        merged = jnp.concatenate([coords, tgt_coords], axis=1)
    else:
        ntargets = nsources
        merged = coords
    n = merged.shape[1]

    if has_extents:
        sr = (jnp.asarray(source_radii, coord_dtype)
              if sources_have_extent
              else jnp.zeros(nsources, coord_dtype))
        tr = (jnp.asarray(target_radii, coord_dtype)
              if targets_have_extent
              else jnp.zeros(ntargets, coord_dtype))
        merged_radii = jnp.concatenate([sr, tr])
    else:
        merged_radii = jnp.zeros(1, coord_dtype)   # unused placeholder
    if n == 0:
        raise ValueError("cannot build a tree from zero particles")

    # refine weights (mirror boxtree/tree_build.py:405-453)
    if max_particles_in_box is not None:
        if refine_weights is not None or max_leaf_refine_weight is not None:
            raise ValueError(
                "may not specify both max_particles_in_box and "
                "refine_weights/max_leaf_refine_weight")
        weights = jnp.ones(n, dtype=jnp.int32)
        max_weight = int(max_particles_in_box)
    elif refine_weights is not None:
        if max_leaf_refine_weight is None:
            raise ValueError("must specify max_leaf_refine_weight with "
                             "refine_weights")
        weights = jnp.asarray(refine_weights)
        if weights.dtype != np.int32:
            raise TypeError("refine_weights must have dtype int32")
        if weights.shape != (n,):
            raise ValueError("refine_weights must have one entry per "
                             "source-and-target particle")
        max_weight = int(max_leaf_refine_weight)
    else:
        raise ValueError("must specify either max_particles_in_box or "
                         "refine_weights/max_leaf_refine_weight")

    if bbox is not None:
        bbox_min_in, root_extent_in = _validate_bbox(
            bbox, dimensions, coord_dtype)
    else:
        bbox_min_in = np.zeros(dimensions, coord_dtype)
        root_extent_in = 1.0
    depth_full = config.max_morton_depth(dimensions)
    # shallow first attempt so the Morton sort's tie-break index packs
    # into the key (ONE int64 sort instead of a ~5x key-value sort);
    # a distribution needing more levels trips the unfit count and
    # retries at full depth.  Extent trees always use full depth (a
    # shallow stick level would silently CHANGE the tree, not fail).
    iota_bits = max(1, int(n - 1).bit_length())
    if has_extents:
        depth = depth_full
    else:
        depth = max(min(depth_full, (63 - iota_bits) // dimensions), 1)

    import os as _os
    import time as _time
    _timing = _os.environ.get("BOXTREE_TPU_TRAV_TIMING") == "1"

    def _toc(name, t0, *sync):
        if _timing:
            jax.block_until_ready(sync)
            print(f"# build {name}: {_time.perf_counter() - t0:.3f}s",
                  flush=True)

    _t = _time.perf_counter() if _timing else None

    while True:
        (codes_s, order, leaf_level, counts_and_unfit, bbox_min,
         root_extent) = _phase_a(
            merged, weights, merged_radii, jnp.asarray(bbox_min_in),
            root_extent_in, max_weight, float(stick_out_factor),
            dimensions=dimensions, depth=depth,
            adaptive=(kind != "non-adaptive"), use_bbox=bbox is not None,
            has_extents=has_extents, extent_norm=extent_norm)

        _toc("phase_a", _t, codes_s)
        _t = _time.perf_counter() if _timing else None
        counts_and_unfit = jax.device_get(counts_and_unfit)
        _toc("host_counts", _t)
        _t = _time.perf_counter() if _timing else None
        counts, n_unfit = counts_and_unfit[:-1], int(counts_and_unfit[-1])
        if not n_unfit:
            break
        if depth < depth_full:
            # shallow fast path exhausted its levels: this
            # distribution genuinely needs the full Morton depth
            depth = depth_full
            continue
        raise MaxLevelsExceeded(
            f"{n_unfit} particles remain in overfull boxes at the deepest "
            f"representable level ({depth})")

    if kind == "adaptive-level-restricted":
        from boxtree_tpu.tree.level_restrict import restrict_leaf_levels
        max_level = int(np.max(np.nonzero(counts)[0]))
        leaf_level, counts = restrict_leaf_levels(
            codes_s, leaf_level, dimensions=dimensions, depth=depth,
            max_level=max_level)

    nlevels = int(np.max(np.nonzero(counts)[0])) + 1
    level_starts = np.concatenate(
        [[0], np.cumsum(counts[:nlevels])]).astype(np.int64)
    nboxes = int(level_starts[-1])
    logger.info("build_tree: %d particles -> %d boxes, %d levels (%s)",
                nsources + (0 if sources_are_targets else ntargets),
                nboxes, nlevels, kind)

    out = _phase_b(
        codes_s, order, leaf_level,
        merged, bbox_min, root_extent,
        dimensions=dimensions, depth=depth,
        level_starts=tuple(int(x) for x in level_starts), cap=nboxes,
        nsources=nsources, ntargets=ntargets,
        sources_are_targets=sources_are_targets,
        has_extents=has_extents)

    _toc("phase_b", _t, out["box_morton"])

    lsb_tuple = tuple(int(x) for x in level_starts)
    if has_extents:
        src_radii_tree = sr[out["user_source_ids"]]
        if sources_are_targets:
            tgt_radii_tree = src_radii_tree
        else:
            tgt_perm = jnp.zeros(ntargets, jnp.int64).at[
                out["sorted_target_ids"].astype(jnp.int64)].set(
                jnp.arange(ntargets, dtype=jnp.int64))
            tgt_radii_tree = tr[tgt_perm]
        sbb_min, sbb_max = _box_extents(
            out["sources"], src_radii_tree if sources_have_extent else None,
            out["box_id_of_source"], out["box_centers"],
            out["box_parent"], lsb=lsb_tuple)
        tbb_min, tbb_max = _box_extents(
            out["targets"], tgt_radii_tree if targets_have_extent else None,
            out["box_id_of_target"], out["box_centers"],
            out["box_parent"], lsb=lsb_tuple)
    else:
        src_radii_tree = tgt_radii_tree = None
        sbb_min = sbb_max = tbb_min = tbb_max = None

    return Tree(
        root_extent=root_extent,
        box_centers=out["box_centers"],
        box_parent_ids=out["box_parent"],
        box_child_ids=out["box_child"],
        box_levels=out["box_level"],
        box_flags=out["box_flags"],
        box_morton_prefixes=out["box_morton"],
        level_start_box_nrs=tuple(int(x) for x in level_starts),
        box_id_dtype=config.box_id_dtype,
        box_level_dtype=config.box_level_dtype,
        coord_dtype=np.dtype(coord_dtype),
        sources_have_extent=sources_have_extent,
        targets_have_extent=targets_have_extent,
        extent_norm=extent_norm,
        stick_out_factor=float(stick_out_factor),
        _is_pruned=True,
        max_depth=depth,
        sources_are_targets=sources_are_targets,
        particle_id_dtype=config.particle_id_dtype,
        sources=out["sources"],
        source_radii=src_radii_tree if sources_have_extent else None,
        targets=out["targets"],
        target_radii=tgt_radii_tree if targets_have_extent else None,
        user_source_ids=out["user_source_ids"],
        sorted_target_ids=out["sorted_target_ids"],
        box_source_starts=out["box_source_starts"],
        box_source_counts_nonchild=out["box_source_counts_nonchild"],
        box_source_counts_cumul=out["box_source_counts_cumul"],
        box_target_starts=out["box_target_starts"],
        box_target_counts_nonchild=out["box_target_counts_nonchild"],
        box_target_counts_cumul=out["box_target_counts_cumul"],
        box_source_bounding_box_min=sbb_min,
        box_source_bounding_box_max=sbb_max,
        box_target_bounding_box_min=tbb_min,
        box_target_bounding_box_max=tbb_max,
        box_id_of_source=out["box_id_of_source"],
        box_id_of_target=out["box_id_of_target"],
    )


class TreeBuilder:
    """Callable-class wrapper for API parity with the reference
    ``boxtree.TreeBuilder``.  Stateless; kernels are jit-cached globally."""

    ROOT_EXTENT_STRETCH_FACTOR = config.ROOT_EXTENT_STRETCH_FACTOR

    def __init__(self, actx=None):
        pass

    def __call__(self, *args, **kwargs):
        # tolerate a leading array-context-like argument for parity
        if args and not hasattr(args[0], "shape") \
                and not isinstance(args[0], (list, tuple, np.ndarray)):
            args = args[1:]
        return build_tree(*args, **kwargs)

# }}}
