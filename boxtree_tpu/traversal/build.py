"""TPU-native FMM traversal (interaction list) builder.

Redesign of ``boxtree/traversal.py:1721-2347``.  The reference computes
every list with per-box *stack walks* over the tree (OpenCL templates at
``boxtree/traversal.py:98-215``).  On TPU we exploit that every box's
position is an integer cell coordinate at its level (decoded from its
Morton prefix), which turns each list into

1. a *static candidate window* in cell space (e.g. the ``(2n+1)^d``
   neighborhood for colleagues, the parity window for List 2, the 3^d
   coarse-neighbor window for cross-level adjacency), plus
2. a vectorized binary-search *existence lookup* into the per-level sorted
   prefix table, plus
3. branch-free predicate filters (adjacency/touching tests in exact
   integer arithmetic — equivalent to the reference's slack-based float
   predicates ``boxtree/traversal.py:255-320``, whose ``min(rad)`` slack
   makes them exactly the closed-box "touching" relation).

Deep-descendant lists (1 and 3) are enumerated *from the finer side*
(source boxes search their bounded set of coarser neighbors) so that every
candidate window stays O(3^d); edges from both directions are merged with
one key-sort per list.

Execution model = the reference's ``ListOfListsBuilder`` count->fill
pattern (``boxtree/tree_build_kernels.py`` imports at ``:32-33``), on TPU:
every list runs a *count* pass and a *fill* pass, both streaming over row
chunks with ``lax.scan`` so peak memory is O(chunk * window) + O(output),
never O(rows * window).  Each pass is one XLA compilation; all list sizes
cross to the host in a single packed transfer.

List membership rules (verified against the reference templates and by
the constant-one completeness oracle):

- colleagues/slnws (``traversal.py:398-464``): same level, cell offset
  within ``well_sep_is_n_away`` (inf-norm).
- List 1 (``traversal.py:470-550``): all source boxes whose closed box
  touches the target box's closed box, any level.
- List 2 (``traversal.py:556-601``): same-level boxes whose parent is a
  colleague of the box's parent but which are not themselves within the
  ``n``-neighborhood.
- List 3 (``traversal.py:607-875``), no-extent case: boxes ``w`` at source
  level ``ls`` with sources in their subtree, not touching the target box
  ``b``, whose parent touches ``b`` (for ``ls - 1 > level(b)``) or is a
  colleague of ``b`` (for ``ls - 1 == level(b)``).
- List 4 (``traversal.py:931-1146``), no-extent case: for each ancestor
  level ``wl``, source boxes in the slnws window of ``b``'s ancestor that
  do not touch ``b`` but touch ``b``'s parent (or sit at ``b``'s own level
  in the 2+-away case).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from boxtree_tpu.ops import morton
from boxtree_tpu.tree.containers import box_flags_enum
from boxtree_tpu.traversal.containers import BuiltList, FMMTraversalInfo
from boxtree_tpu.traversal import neighbors as nbr

import logging

logger = logging.getLogger(__name__)

_F = box_flags_enum
_INVALID_KEY = np.int64(np.iinfo(np.int64).max)
_ROW_CHUNK = 32768


# {{{ static offset tables

def _offsets(dimensions, radius, *, exclude_zero=False, min_inf_norm=None):
    """(m, dimensions) int64 array of integer offsets in [-radius, radius]^d."""
    grids = np.meshgrid(*([np.arange(-radius, radius + 1)] * dimensions),
                        indexing="ij")
    offs = np.stack([g.ravel() for g in grids], axis=1).astype(np.int64)
    norm = np.abs(offs).max(axis=1)
    keep = np.ones(len(offs), bool)
    if exclude_zero:
        keep &= norm > 0
    if min_inf_norm is not None:
        keep &= norm > min_inf_norm
    return offs[keep]

# }}}


# {{{ small utilities

def _exclusive_cumsum(x):
    return jnp.concatenate([jnp.zeros(1, x.dtype), jnp.cumsum(x)])


def _prefix_sum(x):
    """Inclusive prefix sum via ``lax.associative_scan``.

    ``jnp.cumsum``'s TPU lowering is a reduce-window whose scoped-VMEM
    stack allocation crashes the v5e AOT compiler when fused inside the
    emit scans ("Ran out of memory in memory space vmem ... It should
    not be possible to run out of scoped vmem", measured round 3); the
    associative-scan lowering is slice/concat only and compiles clean."""
    return lax.associative_scan(jnp.add, x)


@partial(jax.jit, static_argnames=("total",))
def _mask_to_list(mask, *, total):
    """Indices of True entries, ascending — compaction by ONE int32
    sort (~6 ns/elem) instead of a scatter (~150 ns/elem, the dominant
    cost of the traversal's box-list setup at 1e7; doc/PERF.md
    primitive table)."""
    if total == 0:
        return jnp.zeros(0, jnp.int32)
    n = mask.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    return lax.sort(jnp.where(mask, iota,
                              np.int32(np.iinfo(np.int32).max)))[:total]


def _pad_rows(arr, chunk):
    """Pad axis 0 to a multiple of *chunk* and return (padded, nchunks)."""
    n = arr.shape[0]
    npad = max(chunk, -(-n // chunk) * chunk)
    return jnp.pad(arr, (0, npad - n)), npad // chunk

# }}}


# {{{ geometric predicates (exact integer arithmetic)

def _cells_center(cells, level, bbox_min, root_extent):
    """Float centers of the boxes with integer *cells* at (static) *level*.
    Reproduces the build's center convention (``tree/build.py``), so values
    agree bit-for-bit with ``tree.box_centers``."""
    width = root_extent * (2.0 ** -level)
    shape = (cells.shape[0],) + (1,) * (cells.ndim - 1)
    return (bbox_min.reshape(shape)
            + (cells.astype(bbox_min.dtype) + 0.5) * width)


def _level_rad(level, root_extent):
    """l^inf box "radius" (half width) at *level*
    (``LEVEL_TO_RAD``, boxtree/traversal.py)."""
    return root_extent * (2.0 ** -(level + 1))


_EPS = float(np.finfo(np.float64).eps)


def _meets_sep_smaller(tgt_c, tgt_lev, src_c, src_lev, root_extent, sof, *,
                       crit, dimensions, tgt_ext_c=None, tgt_rvec=None):
    """The with-extent "sep smaller" criterion of the reference
    (``boxtree/traversal.py:707-800``) for one of the three
    ``from_sep_smaller_crit`` flavors.  All center operands broadcast over
    leading axis = dimensions."""
    src_rad = _level_rad(src_lev, root_extent)
    if crit == "static_linf":
        tgt_stick = (1.0 + sof) * _level_rad(tgt_lev, root_extent)
        l_inf = (jnp.abs(tgt_c - src_c) - tgt_stick - src_rad).max(axis=0)
        return jnp.maximum(l_inf, 0.0) >= (2 - 8 * _EPS) * src_rad
    elif crit == "precise_linf":
        l_inf = (jnp.abs(tgt_ext_c - src_c) - tgt_rvec - src_rad).max(axis=0)
        return jnp.maximum(l_inf, 0.0) >= (2 - 8 * _EPS) * src_rad
    elif crit == "static_l2":
        tgt_stick = (1.0 + sof) * _level_rad(tgt_lev, root_extent)
        dist = jnp.sqrt(((tgt_c - src_c) ** 2).sum(axis=0))
        rhs = dist - np.sqrt(dimensions) * tgt_stick - src_rad
        return (2 - 8 * _EPS) * src_rad <= rhs
    raise ValueError(f"unknown from_sep_smaller_crit: {crit}")


def _meets_sep_bigger(tgt_c, tgt_lev, src_c, src_lev, root_extent, sof):
    """``meets_sep_bigger_criterion`` (boxtree/traversal.py:933-971)."""
    max_allowed = (3.0 * (1.0 + sof) * _level_rad(tgt_lev, root_extent)
                   + _level_rad(src_lev, root_extent))
    l_inf = jnp.abs(tgt_c - src_c).max(axis=0)
    return l_inf >= max_allowed * (1 - 8 * _EPS)


def _touch(cells_a, level_a, cells_b, level_b):
    """Closed-box intersection test between boxes given by integer cells
    (``cells_*``: (d, ...) int64; levels static python ints).  Equivalent
    to the reference's ``is_adjacent_or_overlapping``
    (``boxtree/traversal.py:307-318``)."""
    if level_a > level_b:
        cells_a, cells_b = cells_b, cells_a
        level_a, level_b = level_b, level_a
    s = level_b - level_a
    lo = cells_a << np.int64(s)
    hi = (cells_a + 1) << np.int64(s)
    return ((lo <= cells_b + 1) & (cells_b <= hi)).all(axis=0)


def _ancestor_ids(parents, ids, lb):
    """{lt: (B,) global box ids of the level-*lt* ancestors} of the
    level-*lb* boxes *ids* (level lb = the boxes themselves) — one
    parents gather per level."""
    a = jnp.clip(ids, 0).astype(jnp.int64)
    anc = {lb: a}
    for lt in range(lb - 1, -1, -1):
        a = parents[a].astype(jnp.int64)
        anc[lt] = a
    return anc


def _cand_boxes(prefixes, lsb, cand_cells, level, *, ntable=None,
                anc_ids=None, tcols=None):
    """(found, box_id) for window candidates at *level*: either 3^d
    binary searches per row (:func:`_lookup`), or — with *ntable* — ONE
    clamped neighbor-table row gather at the level-*level* ancestor
    (``anc_ids[level]``), whose columns align with ``_offsets`` order;
    *tcols* selects a static column subset (e.g. exclude-zero offsets).
    Entries below the level start are clamped coarser fall-backs =
    not found."""
    if ntable is None:
        return _lookup(prefixes[lsb[level]:lsb[level + 1]], lsb[level],
                       cand_cells, level)
    t = ntable[anc_ids[level]]                           # (B, m)
    if tcols is not None:
        t = t[:, np.asarray(tcols)]
    ids = (jnp.clip(t, 0) & jnp.int32(nbr.ID_MASK)).astype(jnp.int32)
    found = (t >= 0) & (ids >= jnp.int32(lsb[level]))
    return found, ids


def _lookup(prefixes_l, level_start, cand_cells, level):
    """Find boxes at (static) *level* with the given integer cells."""
    nl = prefixes_l.shape[0]
    nb = np.int64(1) << np.int64(level)
    in_range = ((cand_cells >= 0) & (cand_cells < nb)).all(axis=0)
    pfx = morton.interleave(jnp.clip(cand_cells, 0, nb - 1))
    idx = jnp.searchsorted(prefixes_l, pfx)
    idxc = jnp.clip(idx, 0, nl - 1)
    found = in_range & (idx < nl) & (prefixes_l[idxc] == pfx)
    box_id = (level_start + idxc).astype(jnp.int32)
    return found, box_id

# }}}


# {{{ candidate generators ((rows,) chunk -> (rows, K) padded candidates)

def _gen_slnws(rows_pfx, prefixes_l, lsb_lev, offs, *, level, dimensions):
    cells = morton.deinterleave(rows_pfx, dimensions)
    cand = cells[:, :, None] + offs.T[:, None, :]
    found, box_id = _lookup(prefixes_l, lsb_lev, cand, level)
    return jnp.where(found, box_id, -1)


def _gen_list2(rows_pfx, prefixes_l, lsb_lev, offs, *, level, dimensions,
               n_away):
    cells = morton.deinterleave(rows_pfx, dimensions)
    cand = cells[:, :, None] + offs.T[:, None, :]
    parent_diff = ((cand >> np.int64(1))
                   - (cells >> np.int64(1))[:, :, None])
    parent_ok = (jnp.abs(parent_diff) <= n_away).all(axis=0)
    found, box_id = _lookup(prefixes_l, lsb_lev, cand, level)
    return jnp.where(found & parent_ok, box_id, -1)


def _gen_list4(rows_pfx, prefixes, box_flags, offs, *, lb, dimensions,
               n_away, lsb, k_pad, ext=False, bbox_min=None,
               root_extent=None, sof=None, row_ids=None, ntable=None,
               parents=None, tcols=None):
    cells = morton.deinterleave(rows_pfx, dimensions)
    parent_cells = cells >> np.int64(1)
    rows = rows_pfx.shape[0]
    wl_max = lb - 1 if n_away == 1 else lb
    if ext:
        b_c = _cells_center(cells, lb, bbox_min, root_extent)
        p_c = _cells_center(parent_cells, lb - 1, bbox_min, root_extent)
    anc_ids = _ancestor_ids(parents, row_ids, lb) if ntable is not None \
        else None
    chunks = []
    for wl in range(1, wl_max + 1):
        anc = cells >> np.int64(lb - wl)
        cand = anc[:, :, None] + offs.T[:, None, :]
        found, box_id = _cand_boxes(
            prefixes, lsb, cand, wl, ntable=ntable, anc_ids=anc_ids,
            tcols=tcols)
        idc = jnp.where(found, box_id, 0)
        is_src = (box_flags[idc] & _F.IS_SOURCE_BOX) != 0
        not_touch_b = ~_touch(cand, wl, cells[:, :, None], lb)
        touch_p = _touch(cand, wl, parent_cells[:, :, None], lb - 1)
        if ext:
            # with-extent membership (boxtree/traversal.py:1041-1128):
            # must meet the (monotone) sep-bigger criterion here, and
            # either be ineligible for the parent's List 4 or fail the
            # criterion there (so this box is where the interaction
            # enters the downward propagation).
            s_c = _cells_center(cand, wl, bbox_min, root_extent)
            meets_b = _meets_sep_bigger(b_c[:, :, None], lb, s_c, wl,
                                        root_extent, sof)
            would_be_parent = ~touch_p & (wl < lb)
            meets_p = _meets_sep_bigger(p_c[:, :, None], lb - 1, s_c, wl,
                                        root_extent, sof)
            valid = (found & is_src & not_touch_b & meets_b
                     & (~would_be_parent | ~meets_p))
        else:
            if wl == lb:
                enters_here = jnp.ones(cand.shape[1:], bool)
            else:
                enters_here = touch_p
            valid = found & is_src & not_touch_b & enters_here
        chunks.append(jnp.where(valid, box_id, -1))
    if not chunks:
        return jnp.full((rows, k_pad), -1, jnp.int32)
    block = jnp.concatenate(chunks, axis=1)
    if block.shape[1] < k_pad:
        block = jnp.concatenate(
            [block, jnp.full((rows, k_pad - block.shape[1]), -1,
                             jnp.int32)], axis=1)
    return block


def _gen_list1_target_side(rows_pfx, row_boxes, prefixes, box_flags, offs,
                           *, lt, dimensions, lsb):
    """(rows, K) int64 keys tgt_box<<32|src for source levels <= lt."""
    cells = morton.deinterleave(rows_pfx, dimensions)
    out = []
    for ls in range(lt + 1):
        anc = cells >> np.int64(lt - ls)
        cand = anc[:, :, None] + offs.T[:, None, :]
        found, box_id = _lookup(prefixes[lsb[ls]:lsb[ls + 1]], lsb[ls],
                                cand, ls)
        idc = jnp.where(found, box_id, 0)
        is_src = (box_flags[idc] & _F.IS_SOURCE_BOX) != 0
        touch = _touch(cand, ls, cells[:, :, None], lt)
        valid = found & is_src & touch
        keys = jnp.where(
            valid,
            (row_boxes[:, None] << np.int64(32))
            | box_id.astype(jnp.int64),
            _INVALID_KEY)
        out.append(keys)
    return jnp.concatenate(out, axis=1)


def _gen_list1_source_side(rows_pfx, src_ids, prefixes, box_flags,
                           tgt_row_of_box, offs, *, ls, dimensions, lsb):
    """(rows, K) keys for target levels strictly coarser than ls."""
    cells = morton.deinterleave(rows_pfx, dimensions)
    emitter_is_src = (box_flags[src_ids] & _F.IS_SOURCE_BOX) != 0
    out = []
    for lt in range(ls):
        anc = cells >> np.int64(ls - lt)
        cand = anc[:, :, None] + offs.T[:, None, :]
        found, box_id = _lookup(prefixes[lsb[lt]:lsb[lt + 1]], lsb[lt],
                                cand, lt)
        idc = jnp.where(found, box_id, 0)
        is_tgt = tgt_row_of_box[idc] >= 0
        touch = _touch(cand, lt, cells[:, :, None], ls)
        valid = found & is_tgt & touch & emitter_is_src[:, None]
        keys = jnp.where(
            valid,
            (box_id.astype(jnp.int64) << np.int64(32)) | src_ids[:, None],
            _INVALID_KEY)
        out.append(keys)
    return jnp.concatenate(out, axis=1)


def _gen_list3(rows_pfx, w_ids, prefixes, box_flags, tgt_row_of_box,
               offs1, offsn, *, ls, dimensions, lsb):
    """(rows, K) keys for List 3 at source level ls."""
    cells = morton.deinterleave(rows_pfx, dimensions)
    parent_cells = cells >> np.int64(1)
    w_has_src = (box_flags[w_ids]
                 & (_F.IS_SOURCE_BOX | _F.HAS_SOURCE_CHILD_BOXES)) != 0
    out = []
    for lt in range(ls):
        if lt == ls - 1:
            cand = parent_cells[:, :, None] + offsn.T[:, None, :]
        else:
            anc_p = parent_cells >> np.int64(ls - 1 - lt)
            cand = anc_p[:, :, None] + offs1.T[:, None, :]
        found, box_id = _lookup(prefixes[lsb[lt]:lsb[lt + 1]], lsb[lt],
                                cand, lt)
        idc = jnp.where(found, box_id, 0)
        is_tgt = tgt_row_of_box[idc] >= 0
        if lt < ls - 1:
            enters = _touch(cand, lt, parent_cells[:, :, None], ls - 1)
        else:
            enters = jnp.ones(cand.shape[1:], bool)
        not_touch_w = ~_touch(cand, lt, cells[:, :, None], ls)
        valid = (found & is_tgt & enters & not_touch_w
                 & w_has_src[:, None])
        keys = jnp.where(
            valid,
            (box_id.astype(jnp.int64) << np.int64(32)) | w_ids[:, None],
            _INVALID_KEY)
        out.append(keys)
    return jnp.concatenate(out, axis=1)


def _gen_list3_ext(rows_pfx, w_ids, prefixes, box_flags, tgt_row_of_box,
                   src_cumul, tbb_min, tbb_max, bbox_min, root_extent, sof,
                   offsn, *, ls, dimensions, lsb, crit, min_nsources,
                   close, ntable=None, parents=None):
    """(rows, K) keys for the with-target-extent List 3, far (at source
    level *ls*) or close (sources at level *ls*, any coarser target).

    Finer-side enumeration of the reference's with-extent walk
    (``boxtree/traversal.py:607-860``): the level-``lt`` ancestor of source
    box ``w`` must lie in the slnws window of target ``b``; every
    intermediate ancestor must have kept the walk descending (adjacent to
    ``b``, or failing the separation criterion, or forced close by the
    min-nsources threshold — the fail/touch predicates are monotone up the
    ancestor chain, so with a zero threshold checking ``w``'s parent
    suffices); ``w`` itself is classified far/close by the criterion.

    With *ntable*/*parents* (fast mode), candidate discovery reads ONE
    clamped neighbor-table row per (row, ancestor level) — entries not
    AT the probed level are clamped coarser fall-backs, filtered by one
    level-start compare — instead of 3^d binary searches per level
    (~log2(nboxes) gathers each); the membership predicates are
    unchanged.  Ancestor box ids come from the parents chain (one
    gather per level), which also serves the min-nsources chain
    without any lookup."""
    d = dimensions
    cells = morton.deinterleave(rows_pfx, d)
    w_flags = box_flags[jnp.clip(w_ids, 0)]
    if close:
        w_gate = (w_flags & _F.IS_SOURCE_BOX) != 0
    else:
        w_gate = (w_flags
                  & (_F.IS_SOURCE_BOX | _F.HAS_SOURCE_CHILD_BOXES)) != 0
    if min_nsources > 0:
        w_forced = src_cumul[jnp.clip(w_ids, 0)] < min_nsources
    else:
        w_forced = jnp.zeros(w_ids.shape[0], bool)
    w_c = _cells_center(cells, ls, bbox_min, root_extent)

    anc_ids = _ancestor_ids(parents, w_ids, ls) if ntable is not None \
        else None

    out = []
    for lt in range(ls):
        anc = cells >> np.int64(ls - lt)
        cand = anc[:, :, None] + offsn.T[:, None, :]
        found, box_id = _cand_boxes(
            prefixes, lsb, cand, lt, ntable=ntable, anc_ids=anc_ids)
        idc = jnp.where(found, box_id, 0)
        is_tgt = tgt_row_of_box[idc] >= 0
        b_c = _cells_center(cand, lt, bbox_min, root_extent)
        if crit == "precise_linf":
            b_ext_c = 0.5 * (tbb_min[:, idc] + tbb_max[:, idc])
            b_rvec = 0.5 * (tbb_max[:, idc] - tbb_min[:, idc])
        else:
            b_ext_c = b_rvec = None

        def meets(src_c, src_lev):
            return _meets_sep_smaller(
                b_c, lt, src_c, src_lev, root_extent, sof, crit=crit,
                dimensions=d, tgt_ext_c=b_ext_c, tgt_rvec=b_rvec)

        meets_w = meets(w_c[:, :, None], ls)
        not_touch_w = ~_touch(cand, lt, cells[:, :, None], ls)

        # descent-chain condition over intermediate ancestors
        if min_nsources > 0:
            chain = jnp.ones(cand.shape[1:], bool)
            for la in range(lt + 1, ls):
                anc_a = cells >> np.int64(ls - la)
                a_c = _cells_center(anc_a, la, bbox_min, root_extent)
                touch_a = _touch(cand, lt, anc_a[:, :, None], la)
                meets_a = meets(a_c[:, :, None], la)
                if anc_ids is not None:
                    id_a = anc_ids[la]
                else:
                    _, id_a = _lookup(prefixes[lsb[la]:lsb[la + 1]],
                                      lsb[la], anc_a, la)
                forced_a = src_cumul[id_a] < min_nsources
                chain &= touch_a | ~meets_a | forced_a[:, None]
        elif lt < ls - 1:
            parent = cells >> np.int64(1)
            p_c = _cells_center(parent, ls - 1, bbox_min, root_extent)
            chain = (_touch(cand, lt, parent[:, :, None], ls - 1)
                     | ~meets(p_c[:, :, None], ls - 1))
        else:
            chain = jnp.ones(cand.shape[1:], bool)

        if close:
            classify = ~meets_w | w_forced[:, None]
        else:
            classify = meets_w & ~w_forced[:, None]
        valid = (found & is_tgt & not_touch_w & chain & classify
                 & w_gate[:, None])
        keys = jnp.where(
            valid,
            (box_id.astype(jnp.int64) << np.int64(32)) | w_ids[:, None],
            _INVALID_KEY)
        out.append(keys)
    return jnp.concatenate(out, axis=1)


def _gen_list4_close(rows_pfx, b_ids, prefixes, box_flags, tgt_row_of_box,
                     bbox_min, root_extent, sof, offs, *, lb, dimensions,
                     n_away, lsb, ntable=None, parents=None, tcols=None):
    """(rows, K) keys for List 4 close: slnws-of-ancestor source boxes that
    are non-adjacent to the target box but fail the sep-bigger criterion
    (``boxtree/traversal.py:1046-1066``); rows are indexed by target-box
    row directly (the reference reindexes with ``_ListMerger``,
    ``traversal.py:2255-2287``).  *ntable*/*parents*: table-row candidate
    discovery (see :func:`_cand_boxes`)."""
    d = dimensions
    cells = morton.deinterleave(rows_pfx, d)
    rows = rows_pfx.shape[0]
    b_c = _cells_center(cells, lb, bbox_min, root_extent)
    b_is_tgt = tgt_row_of_box[jnp.clip(b_ids, 0)] >= 0
    wl_max = lb - 1 if n_away == 1 else lb
    anc_ids = _ancestor_ids(parents, b_ids, lb) if ntable is not None \
        else None
    out = []
    for wl in range(1, wl_max + 1):
        anc = cells >> np.int64(lb - wl)
        cand = anc[:, :, None] + offs.T[:, None, :]
        found, box_id = _cand_boxes(
            prefixes, lsb, cand, wl, ntable=ntable, anc_ids=anc_ids,
            tcols=tcols)
        idc = jnp.where(found, box_id, 0)
        is_src = (box_flags[idc] & _F.IS_SOURCE_BOX) != 0
        not_touch_b = ~_touch(cand, wl, cells[:, :, None], lb)
        s_c = _cells_center(cand, wl, bbox_min, root_extent)
        fails_b = ~_meets_sep_bigger(b_c[:, :, None], lb, s_c, wl,
                                     root_extent, sof)
        valid = (found & is_src & not_touch_b & fails_b
                 & b_is_tgt[:, None])
        keys = jnp.where(
            valid,
            (b_ids[:, None] << np.int64(32)) | box_id.astype(jnp.int64),
            _INVALID_KEY)
        out.append(keys)
    if not out:
        return jnp.full((rows, 1), _INVALID_KEY, jnp.int64)
    return jnp.concatenate(out, axis=1)

# }}}


# {{{ chunked count / fill engines

def _count_rowlist(gen, rows_pfx, row_base, row_counts):
    """Accumulate per-row valid counts for one level's rows (chunked)."""
    padded, nchunks = _pad_rows(rows_pfx, _ROW_CHUNK)
    nrows = rows_pfx.shape[0]
    idx = row_base + jnp.arange(padded.shape[0], dtype=jnp.int64)
    idx = jnp.where(jnp.arange(padded.shape[0]) < nrows, idx,
                    row_counts.shape[0])

    def body(carry, inp):
        rows, ridx = inp
        cnt = (gen(rows) >= 0).sum(axis=1)
        return carry.at[ridx].add(cnt.astype(jnp.int32), mode="drop"), None

    row_counts, _ = lax.scan(
        body, row_counts,
        (padded.reshape(nchunks, -1), idx.reshape(nchunks, -1)))
    return row_counts


def _fill_rowlist(gen, rows_pfx, row_base, starts, out):
    padded, nchunks = _pad_rows(rows_pfx, _ROW_CHUNK)
    nrows = rows_pfx.shape[0]
    total = out.shape[0]
    idx = row_base + jnp.arange(padded.shape[0], dtype=jnp.int64)
    valid_row = jnp.arange(padded.shape[0]) < nrows

    def body(carry, inp):
        out = carry
        rows, ridx, vr = inp
        cand = gen(rows)
        valid = (cand >= 0) & vr[:, None]
        rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
        pos = starts[jnp.clip(ridx, 0, starts.shape[0] - 1)].astype(
            jnp.int64)[:, None] + rank
        # unique sentinel per lane keeps the scatter on XLA's
        # unique-indices fast path (dropped either way)
        lane = jnp.arange(cand.size, dtype=jnp.int64).reshape(cand.shape)
        out = out.at[jnp.where(valid, pos, total + lane)].set(
            cand, mode="drop", unique_indices=True)
        return out, None

    out, _ = lax.scan(
        body, out,
        (padded.reshape(nchunks, -1), idx.reshape(nchunks, -1),
         valid_row.reshape(nchunks, -1)))
    return out


_L2_FILL_CHUNK = 1024


def _emit_compact(gen, rows_pfx, aux, buf, off):
    """Fused key emission + chunk-local sort + compaction.

    Each scan chunk's keys are sorted locally (valid keys first —
    ``_INVALID_KEY`` sorts last) and the WHOLE sorted chunk — garbage
    tail included — is written at the running valid offset *off*; the
    offset then advances by the chunk's valid count, so the next write
    overwrites the previous tail.  After the scan ``buf[:off]`` holds
    exactly the valid keys (sorted per chunk) and ``buf[off:]`` is all
    ``_INVALID_KEY`` (*buf* must arrive pre-filled with it).

    TPU rationale (doc/PERF.md): the emitted lanes are ~85-95% invalid
    pad (the cross-level windows rarely hit leaf boxes), so the former
    design's ONE global sort over every padded lane paid multi-GB
    multi-pass traffic; chunk sorts pay only ~log^2(chunk) passes over
    O(chunk) memory and the final compaction sort (``_edge_sort_pass``)
    runs over just the real edges, whose count became static at the
    host sync."""
    padded, nchunks = _pad_rows(rows_pfx, _ROW_CHUNK)
    nrows = rows_pfx.shape[0]
    aux_p = [_pad_rows(a, _ROW_CHUNK)[0] for a in aux]
    valid_row = jnp.arange(padded.shape[0]) < nrows

    def body(carry, inp):
        buf, off = carry
        vr = inp[-1]
        keys = jnp.where(vr[:, None], gen(inp[0], *inp[1:-1]),
                         _INVALID_KEY)
        skeys = lax.sort(keys.reshape(-1))
        nv = jnp.searchsorted(skeys, _INVALID_KEY).astype(jnp.int64)
        buf = lax.dynamic_update_slice(buf, skeys, (off,))
        return (buf, off + nv), None

    (buf, off), _ = lax.scan(
        body, (buf, off),
        (*(a.reshape(nchunks, -1) for a in (padded, *aux_p)),
         valid_row.reshape(nchunks, -1)))
    return buf, off


def _emit_rowcsr(gen, rows_pfx, row_base, buf, off, starts, chunk,
                 keep64=False):
    """Fused rowlist count+fill: compaction-scan emission (as
    :func:`_emit_compact`) PLUS the dense CSR starts from the pre-sort
    per-row counts (rows ascend in enumeration order, so the exclusive
    cumsum IS each key's sorted position).

    Requires the caller's plan to enumerate global row indices
    contiguously ascending — every rowlist plan does (rows ARE the CSR
    order) — which makes the compacted int32 value buffer ALREADY the
    final CSR array: no separate counts enumeration, no cumsum, no
    global sort.  Rows past a segment's end (emission pads) resolve to
    the running offset and are overwritten by the next segment, so
    *starts* needs one chunk of slack past its logical end.

    With ``keep64=True`` the buffer keeps the full ``(row << 32) | val``
    int64 keys (for callers that may still need a cross-plan merge
    sort, e.g. List 1's target side).

    (Measured dead end, r4: per-chunk ``lax.cond`` fast branches for
    all-valid / all-invalid chunks do NOT pay on this TPU backend — the
    conditional executes as if both sides ran, adding ~10% instead of
    skipping the chunk sort.)"""
    padded, nchunks = _pad_rows(rows_pfx, chunk)
    nrows = rows_pfx.shape[0]
    gidx = row_base + jnp.arange(padded.shape[0], dtype=jnp.int64)
    valid_row = jnp.arange(padded.shape[0]) < nrows
    mask32 = np.int64(0xFFFFFFFF)

    def out_of(k64):
        return k64 if keep64 else (k64 & mask32).astype(jnp.int32)

    def body(carry, inp):
        buf, off, starts = carry
        rows, ridx, vr = inp
        cand = gen(rows)
        valid = (cand >= 0) & vr[:, None]
        keys = jnp.where(
            valid, (ridx[:, None] << np.int64(32))
            | cand.astype(jnp.int64), _INVALID_KEY)
        buf = lax.dynamic_update_slice(
            buf, out_of(lax.sort(keys.reshape(-1))), (off,))
        # per-row starts from the pre-sort counts (rows ascend in
        # enumeration order, so exclusive cumsum == sorted position);
        # a chunk-sized cumsum beats a searchsorted into chunk*K keys
        cnt = valid.sum(axis=1).astype(jnp.int64)
        csum = _prefix_sum(cnt)
        starts = lax.dynamic_update_slice(
            starts, off + csum - cnt, (ridx[0],))
        return (buf, off + csum[-1], starts), None

    (buf, off, starts), _ = lax.scan(
        body, (buf, off, starts),
        (padded.reshape(nchunks, -1), gidx.reshape(nchunks, -1),
         valid_row.reshape(nchunks, -1)))
    return buf, off, starts


def _emit_l1_fast(gen, rows_pfx, row_base, bufT, offT, startsT,
                  bufS, offS):
    """Fused both-sides List-1 emission over rows that are BOTH the
    target CSR rows and the source participants (``sources_are_targets``
    fast path): one clamped-table row gather per row feeds the
    CSR-ordered target side (:func:`_emit_rowcsr` semantics, int64
    keys + dense starts) AND the compacted source-side key buffer
    (:func:`_emit_compact` semantics) in the same scan."""
    padded, nchunks = _pad_rows(rows_pfx, _ROW_CHUNK)
    nrows = rows_pfx.shape[0]
    gidx = row_base + jnp.arange(padded.shape[0], dtype=jnp.int64)
    valid_row = jnp.arange(padded.shape[0]) < nrows

    def body(carry, inp):
        bufT, offT, startsT, bufS, offS = carry
        rows, ridx, vr = inp
        cand_t, keys_s = gen(rows, rows.astype(jnp.int64))
        # target side: CSR-ordered keys + counts-based dense starts
        valid = (cand_t >= 0) & vr[:, None]
        keys_t = jnp.where(
            valid, (ridx[:, None] << np.int64(32))
            | cand_t.astype(jnp.int64), _INVALID_KEY)
        bufT = lax.dynamic_update_slice(
            bufT, lax.sort(keys_t.reshape(-1)), (offT,))
        cnt = valid.sum(axis=1).astype(jnp.int64)
        csum = _prefix_sum(cnt)
        startsT = lax.dynamic_update_slice(
            startsT, offT + csum - cnt, (ridx[0],))
        # source side: compaction write
        keys_s = jnp.where(vr[:, None], keys_s, _INVALID_KEY)
        skeys = lax.sort(keys_s.reshape(-1))
        nv = jnp.searchsorted(skeys, _INVALID_KEY).astype(jnp.int64)
        bufS = lax.dynamic_update_slice(bufS, skeys, (offS,))
        return (bufT, offT + csum[-1], startsT, bufS, offS + nv), None

    (bufT, offT, startsT, bufS, offS), _ = lax.scan(
        body, (bufT, offT, startsT, bufS, offS),
        (padded.reshape(nchunks, -1), gidx.reshape(nchunks, -1),
         valid_row.reshape(nchunks, -1)))
    return bufT, offT, startsT, bufS, offS


def _emit_l2_parent_rowcsr(gen, prows, child_level_parents, lsb_child,
                           totp_boxes, is_totp, buf, off, starts):
    """Fused parent-side List-2 emission + dense totp-row starts.

    A chunk of parents covers a contiguous ascending range of child
    boxes (child ids are assigned in parent order), so its
    ``(child << 32) | cand`` keys form a contiguous CSR segment whose
    present totp children occupy CONSECUTIVE totp rows; their starts
    come from the exclusive cumsum of per-child counts, compacted with
    one chunk-of-parents-sized sort (see the body comment)."""
    padded, nchunks = _pad_rows(prows, _L2_FILL_CHUNK)
    vrow = jnp.arange(padded.shape[0]) < prows.shape[0]
    mask32 = np.int64(0xFFFFFFFF)
    tb64 = totp_boxes.astype(jnp.int64)

    def body(carry, inp):
        buf, off, starts = carry
        rows, vr = inp
        cand, own = gen(rows)
        own_row = is_totp[jnp.clip(own, 0).astype(jnp.int64)]
        row_sel = (own > 0) & own_row & vr[:, None]
        valid = (cand >= 0) & row_sel[..., None]
        keys = jnp.where(
            valid, (own.astype(jnp.int64)[..., None] << np.int64(32))
            | cand.astype(jnp.int64), _INVALID_KEY)
        skeys = lax.sort(keys.reshape(-1))
        buf = lax.dynamic_update_slice(
            buf, (skeys & mask32).astype(jnp.int32), (off,))
        # per-totp-row starts WITHOUT a searchsorted into the big sorted
        # chunk: flattened (parent, child-digit) order == child-id order
        # == totp-row order, so the exclusive cumsum of per-child valid
        # counts is each child's sorted position, and the chunk's
        # present totp children occupy CONSECUTIVE totp rows from tr0 —
        # compact the selected slots' positions with one small sort
        cnt = valid.sum(axis=2).astype(jnp.int64).reshape(-1)
        csum = _prefix_sum(cnt)
        local = csum - cnt                      # (chunk * 2^d,)
        sel = row_sel.reshape(-1)
        rank = _prefix_sum(sel.astype(jnp.int32)) - sel
        w = (lax.sort(jnp.where(
            sel, (rank.astype(jnp.int64) << np.int64(32)) | local,
            _INVALID_KEY)) & mask32)
        # first child box of this chunk's first parent -> first totp row
        fc = lsb_child + jnp.searchsorted(
            child_level_parents, rows[0].astype(jnp.int64))
        tr0 = jnp.searchsorted(tb64, fc).astype(jnp.int64)
        starts = lax.dynamic_update_slice(starts, off + w, (tr0,))
        return (buf, off + csum[-1], starts), None

    (buf, off, starts), _ = lax.scan(
        body, (buf, off, starts),
        (padded.reshape(nchunks, -1), vrow.reshape(nchunks, -1)))
    return buf, off, starts


# }}}


def _count_below(vals, nq):
    """``out[r] = #(vals < r)`` for ``r in [0, nq)`` — the cumulative
    histogram a ``searchsorted(sort(vals), arange(nq))`` computes, via
    two flat sorts instead: device searchsorted costs ~550 ns/query on
    this TPU (measured, doc/PERF.md r5) vs ~6.6 ns/elem for a sort.
    Values tag-packed AFTER equal queries so equals are not counted
    (searchsorted 'left' semantics); each query's merged position minus
    its own rank is then the count of smaller values."""
    nv = vals.shape[0]
    keys = jnp.concatenate([
        (vals.astype(jnp.int64) << 1) | 1,
        jnp.arange(nq, dtype=jnp.int64) << 1])
    srt = lax.sort(keys)
    iota = jnp.arange(nv + nq, dtype=jnp.int64)
    pos = lax.sort(jnp.where((srt & 1) == 0, iota,
                             jnp.int64(nv + nq)))[:nq]
    return pos - jnp.arange(nq, dtype=jnp.int64)


def _starts_of_rows(rows_sorted, nrows):
    return jnp.searchsorted(
        rows_sorted, jnp.arange(nrows + 1, dtype=jnp.int64)).astype(
            jnp.int32)


def _starts_of_box_keys(boxes_sorted, target_boxes, nboxes):
    """CSR starts over target_boxes rows for keys carrying *box ids*
    (valid keys' boxes all appear in target_boxes, which is ascending,
    so box order == row order)."""
    bounds = jnp.concatenate(
        [target_boxes.astype(jnp.int64),
         jnp.full(1, nboxes, jnp.int64)])
    return jnp.searchsorted(boxes_sorted, bounds).astype(jnp.int32)


# {{{ count passes (one compilation each)

def _rowlist_gens(prefixes, totp_boxes, box_flags, ntable, parents,
                  child_rows, *, dimensions, n_away, lsb, fast,
                  src_levels=None, ext=False, bbox_min=None,
                  root_extent=None, sof=None):
    """Per-level generator triples (slnws, list2, list4) over box-id rows.
    ``fast`` is a MODE: 0 = generic binary-search generators, 1 = full
    neighbor-table fast path (n_away == 1), 2 = partial fast (slnws and
    List 2 off a radius-n table, List 4 generic — its n>=2 membership
    rule mixes touching and colleague criteria across levels)."""
    d = dimensions
    nlevels = len(lsb) - 1
    offs_n = jnp.asarray(_offsets(d, n_away, exclude_zero=True))
    offs_2 = jnp.asarray(_offsets(d, 2 * n_away + 1, min_inf_norm=n_away))
    k_pad4 = max(1, offs_n.shape[0] * (nlevels - 1))

    def make(lev):
        if fast:
            gen_s = partial(nbr.fgen_slnws, ntable=ntable,
                            lsb_lev=lsb[lev], dimensions=d)
            gen_2 = partial(nbr.fgen_list2, ntable=ntable,
                            child_rows=child_rows, parents=parents,
                            prefixes=prefixes, dimensions=d,
                            min_id=lsb[lev - 1] if lev >= 1 else 0,
                            n_away=n_away)
            if fast == 1 and not ext:
                gen_4 = partial(nbr.fgen_list4, ntable=ntable,
                                parents=parents, prefixes=prefixes,
                                lb=lev, dimensions=d, lsb=lsb)
                return gen_s, gen_2, gen_4
            # ext: List-4 membership needs the sep-bigger criterion per
            # ancestor level — generic generator (it branches on ext)
            gen_4 = _generic_gen4(lev)
            return gen_s, gen_2, gen_4
        pfx_l = prefixes[lsb[lev]:lsb[lev + 1]]

        def by_pfx(g):
            def wrapped(rows, g=g):
                return g(prefixes[jnp.clip(rows, 0).astype(jnp.int64)])
            return wrapped

        gen_s = by_pfx(partial(_gen_slnws, prefixes_l=pfx_l,
                               lsb_lev=lsb[lev], offs=offs_n, level=lev,
                               dimensions=d))
        gen_2 = by_pfx(partial(_gen_list2, prefixes_l=pfx_l,
                               lsb_lev=lsb[lev], offs=offs_2, level=lev,
                               dimensions=d, n_away=n_away))
        gen_4 = _generic_gen4(lev)
        return gen_s, gen_2, gen_4

    m_full = (2 * n_away + 1) ** d
    tcols_nz = tuple(j for j in range(m_full) if j != m_full // 2)

    def _generic_gen4(lev):
        def wrapped(rows):
            return _gen_list4(
                prefixes[jnp.clip(rows, 0).astype(jnp.int64)],
                prefixes=prefixes, box_flags=box_flags, offs=offs_n,
                lb=lev, dimensions=d, n_away=n_away, lsb=lsb,
                k_pad=k_pad4, ext=ext, bbox_min=bbox_min,
                root_extent=root_extent, sof=sof, row_ids=rows,
                ntable=ntable if fast else None, parents=parents,
                tcols=tcols_nz)
        return wrapped

    return make


@partial(jax.jit, static_argnames=("lsb",))
def _emit_row_prune(ntable, parents, child_rows, box_flags, *, lsb):
    """Per-level emission-row pruning masks (fast modes): compacted row
    ids + counts, one tiny host pull.

    - List 2 enumerates from the parent side, so childless (leaf)
      parents only contribute dead lanes: keep boxes with any child.
    - List 3 at source level ``ls`` probes the PARENT's clamped table
      row for coarser target leaves; a parent-level box whose row has
      no TGT entry gives w no candidates (in near-uniform trees that
      prunes ~90+% of the lanes, doc/PERF.md r5), and a w without
      sources emits nothing either.

    Returns per level ``(l2_ids, l3_ids)`` sorted-compacted (invalid =
    INT32_MAX at the tail) plus a packed (2, nlevels) count table."""
    nlevels = len(lsb) - 1
    big = jnp.int32(np.iinfo(np.int32).max)
    l2_ids, l3_ids = [], []
    counts = jnp.zeros((2, nlevels), jnp.int64)
    for lev in range(nlevels):
        ids = jnp.arange(lsb[lev], lsb[lev + 1], dtype=jnp.int32)
        if lev < nlevels - 1:
            keep2 = (child_rows[lsb[lev]:lsb[lev + 1]] > 0).any(axis=1)
            l2_ids.append(lax.sort(jnp.where(keep2, ids, big)))
            counts = counts.at[0, lev].set(keep2.sum())
        else:
            l2_ids.append(ids[:0])
        if lev >= 1:
            prow = ntable[lsb[lev - 1]:lsb[lev]]
            pmask = ((prow >= 0)
                     & ((prow & nbr.TGT_BIT) != 0)).any(axis=1)
            par_l = (parents[lsb[lev]:lsb[lev + 1]].astype(jnp.int64)
                     - lsb[lev - 1])
            keep3 = pmask[par_l]
            keep3 &= (box_flags[lsb[lev]:lsb[lev + 1]]
                      & (_F.IS_SOURCE_BOX
                         | _F.HAS_SOURCE_CHILD_BOXES)) != 0
            l3_ids.append(lax.sort(jnp.where(keep3, ids, big)))
            counts = counts.at[1, lev].set(keep3.sum())
        else:
            l3_ids.append(ids[:0])
    return tuple(l2_ids), tuple(l3_ids), counts


@partial(jax.jit, static_argnames=("dimensions", "n_away", "lsb",
                                   "ls_totp", "fast", "src_levels", "ext"))
def _rowlists_emit_pass(prefixes, totp_boxes, box_flags, ntable, parents,
                        child_rows, bbox_min, root_extent, sof,
                        l2_rows=None, *, dimensions, n_away, lsb,
                        ls_totp, fast, src_levels=None, ext=False):
    """Single-enumeration slnws / List 2 / List 4 construction: the
    compaction scan (:func:`_emit_rowcsr`) emits each list's values in
    final CSR order (the plans enumerate rows ascending) and reads the
    dense starts off the chunk-sorted keys — replacing the separate
    counts pass + cumsum + second fill enumeration (doc/PERF.md).
    Returns per list ``(starts[int64, nrows+1], values_buf, total)``
    where ``values_buf[:total]`` is the list."""
    nlevels = len(lsb) - 1
    nboxes = lsb[-1]
    ntotp = ls_totp[-1]
    make = _rowlist_gens(prefixes, totp_boxes, box_flags, ntable, parents,
                         child_rows, dimensions=dimensions, n_away=n_away,
                         lsb=lsb, fast=fast, src_levels=src_levels,
                         ext=ext, bbox_min=bbox_min,
                         root_extent=root_extent, sof=sof)

    # emission plans: (generator, rows, global CSR row base) per level
    slnws_plan, l2_plan, l4_plan = [], [], []
    for lev in range(nlevels):
        gen_s, gen_2, gen_4 = make(lev)
        ids_l = jnp.arange(lsb[lev], lsb[lev + 1], dtype=jnp.int32)
        slnws_plan.append((gen_s, ids_l, lsb[lev]))
        r0, r1 = ls_totp[lev], ls_totp[lev + 1]
        if r1 == r0 or lev == 0:
            continue
        rows = totp_boxes[r0:r1]
        if not fast:
            l2_plan.append((gen_2, rows, r0))
        if fast == 1 and not ext:
            # List-4 sources live at levels 1..lev-1 (coarser leaves)
            if any(src_levels is None or src_levels[wl]
                   for wl in range(1, lev)):
                l4_plan.append((gen_4, rows, r0))
        elif not (n_away == 1 and lev == 1):
            l4_plan.append((gen_4, rows, r0))

    def run(plan, nrows_total):
        if not plan:
            return (jnp.zeros(nrows_total + 1, jnp.int64),
                    jnp.zeros(0, jnp.int32), jnp.int64(0))
        chunks, size = [], 0
        for gen, rows, _rb in plan:
            k = jax.eval_shape(
                gen, jax.ShapeDtypeStruct((16,), rows.dtype)).shape[1]
            # keep per-chunk sorts ~1-2M lanes
            c = _ROW_CHUNK if k <= 32 else _ROW_CHUNK // 4
            chunks.append(c)
            size += max(1, -(-rows.shape[0] // c)) * c * k
        buf = jnp.zeros(size, jnp.int32)
        starts = jnp.zeros(nrows_total + 1 + max(chunks), jnp.int64)
        off = jnp.int64(0)
        for c, (gen, rows, rb) in zip(chunks, plan):
            buf, off, starts = _emit_rowcsr(gen, rows, rb, buf, off,
                                            starts, c)
        starts = starts.at[nrows_total].set(off)
        return starts[:nrows_total + 1], buf, off

    slnws = run(slnws_plan, nboxes)
    l4 = run(l4_plan, ntotp)

    if fast:
        # List 2 from the parent side: one table row + 3^d child rows
        # per parent serve all 2^d children (fgen_list2_parent); the
        # per-level min_id filters clamped coarser parent-row entries
        def gen2p_at(plev):
            return partial(nbr.fgen_list2_parent, ntable=ntable,
                           child_rows=child_rows, dimensions=dimensions,
                           min_id=lsb[plev], n_away=n_away)
        is_totp = jnp.zeros(nboxes + 1, bool).at[
            totp_boxes.astype(jnp.int64)].set(True)
        def prows_at(plev):
            """Emission rows of parent level *plev*: every level box,
            or — when the pruning pass ran — only boxes WITH children
            (childless parents contribute dead lanes only; their absent
            children occupy no CSR rows, so skipping them keeps the
            child-row sequence consecutive)."""
            if l2_rows is not None and l2_rows[plev] is not None:
                return l2_rows[plev]
            return jnp.arange(lsb[plev], lsb[plev + 1], dtype=jnp.int32)

        cs = jax.eval_shape(gen2p_at(0), jax.ShapeDtypeStruct(
            (_L2_FILL_CHUNK,), jnp.int32))[0].shape
        size = sum(
            max(1, -(-int(prows_at(p).shape[0]) // _L2_FILL_CHUNK))
            * _L2_FILL_CHUNK * cs[1] * cs[2]
            for p in range(nlevels - 1))
        wrows = _L2_FILL_CHUNK * cs[1] + 1
        buf = jnp.zeros(size, jnp.int32)
        starts = jnp.zeros(ntotp + 1 + wrows, jnp.int64)
        off = jnp.int64(0)
        for plev in range(nlevels - 1):
            clp = parents[lsb[plev + 1]:lsb[plev + 2]].astype(jnp.int64)
            buf, off, starts = _emit_l2_parent_rowcsr(
                gen2p_at(plev), prows_at(plev), clp, lsb[plev + 1],
                totp_boxes, is_totp, buf, off, starts)
        starts = starts.at[ntotp].set(off)
        l2 = (starts[:ntotp + 1], buf, off)
    else:
        l2 = run(l2_plan, ntotp)

    return slnws, l2, l4


def _edge_gens(prefixes, box_flags, tgt_row_of_box, ntable, parents, *,
               dimensions, n_away, lsb, fast, src_levels=None,
               tgt_levels=None, ext=False, ext_data=None, crit=None,
               min_nsources=0):
    """Generator factories for the key-sorted edge lists (1 and 3, plus
    the with-extent close lists 3-close and 4-close)."""
    d = dimensions
    offs1 = jnp.asarray(_offsets(d, 1))
    offsn = jnp.asarray(_offsets(d, n_away))
    if ext:
        src_cumul, tbb_min, tbb_max, bbox_min, root_extent, sof = ext_data

    # List 1 only ever needs the |delta| <= 1 columns; with a radius-n
    # table (n_away >= 2 partial-fast mode) the gens slice them out
    tcols = (None if n_away == 1
             else tuple(int(x) for x in nbr.touch_columns(d, n_away)))

    def l1t(lt):
        """Fast path only: target-side List-1 candidates (one clamped
        row; emitted in CSR order, no post-sort)."""
        return partial(nbr.fgen_list1_tgt, ntable=ntable,
                       prefixes=prefixes, lt=lt, dimensions=d, lsb=lsb,
                       touch_cols=tcols)

    def l1s(lt):
        """Fast path only: source-side (cross-level) List-1 keys."""
        return partial(nbr.fgen_list1_src, ntable=ntable,
                       prefixes=prefixes, lt=lt, dimensions=d, lsb=lsb,
                       touch_cols=tcols)

    def l1b(lt):
        """Fast path, sources_are_targets: both sides, one row gather."""
        return partial(nbr.fgen_list1_both, ntable=ntable,
                       prefixes=prefixes, lt=lt, dimensions=d, lsb=lsb,
                       touch_cols=tcols)

    def l1_tgt(lt):
        g = partial(_gen_list1_target_side, prefixes=prefixes,
                    box_flags=box_flags, offs=offs1, lt=lt,
                    dimensions=d, lsb=lsb)
        return lambda rows, ri: g(
            prefixes[jnp.clip(rows, 0).astype(jnp.int64)], ri)

    def l1_src(ls):
        g = partial(_gen_list1_source_side, prefixes=prefixes,
                    box_flags=box_flags, tgt_row_of_box=tgt_row_of_box,
                    offs=offs1, ls=ls, dimensions=d, lsb=lsb)
        return lambda rows, si: g(
            prefixes[jnp.clip(rows, 0).astype(jnp.int64)], si)

    def l3(ls, close=False):
        if ext:
            g = partial(_gen_list3_ext, prefixes=prefixes,
                        box_flags=box_flags,
                        tgt_row_of_box=tgt_row_of_box,
                        src_cumul=src_cumul, tbb_min=tbb_min,
                        tbb_max=tbb_max, bbox_min=bbox_min,
                        root_extent=root_extent, sof=sof, offsn=offsn,
                        ls=ls, dimensions=d, lsb=lsb, crit=crit,
                        min_nsources=min_nsources, close=close,
                        ntable=ntable if fast else None,
                        parents=parents)
            return lambda rows, wi: g(
                prefixes[jnp.clip(rows, 0).astype(jnp.int64)], wi)
        if fast == 1:
            return partial(nbr.fgen_list3, ntable=ntable, parents=parents,
                           box_flags=box_flags,
                           prefixes=prefixes, ls=ls, dimensions=d,
                           lsb=lsb)
        g = partial(_gen_list3, prefixes=prefixes, box_flags=box_flags,
                    tgt_row_of_box=tgt_row_of_box, offs1=offs1,
                    offsn=offsn, ls=ls, dimensions=d, lsb=lsb)
        return lambda rows, wi: g(
            prefixes[jnp.clip(rows, 0).astype(jnp.int64)], wi)

    def l4c(lb):
        offs_n_nz = jnp.asarray(_offsets(d, n_away, exclude_zero=True))
        m = (2 * n_away + 1) ** d
        g = partial(_gen_list4_close, prefixes=prefixes,
                    box_flags=box_flags, tgt_row_of_box=tgt_row_of_box,
                    bbox_min=bbox_min, root_extent=root_extent, sof=sof,
                    offs=offs_n_nz, lb=lb, dimensions=d, n_away=n_away,
                    lsb=lsb, ntable=ntable if fast else None,
                    parents=parents,
                    tcols=tuple(j for j in range(m) if j != m // 2))
        return lambda rows, bi: g(
            prefixes[jnp.clip(rows, 0).astype(jnp.int64)], bi)

    return (l1t, l1s, l1b), l1_tgt, l1_src, l3, l4c


# }}}


# {{{ edge emission passes

@partial(jax.jit, static_argnames=(
    "dimensions", "n_away", "lsb", "ls_tgt", "ls_part", "ntarget_boxes",
    "fast", "src_levels", "tgt_levels", "ls_totp", "ext", "crit",
    "min_nsources", "l1_same_rows"))
def _edge_emit_pass(prefixes, target_boxes, part_boxes, box_flags,
                    tgt_row_of_box, ntable, parents, totp_boxes,
                    ext_data, l3_rows=None, *, dimensions, n_away, lsb,
                    ls_tgt, ls_part=None, ntarget_boxes=0, fast=False,
                    src_levels=None, tgt_levels=None, ls_totp=None,
                    ext=False, crit=None, min_nsources=0,
                    l1_same_rows=False):
    """Single-enumeration edge emission for List 1, the per-source-level
    List 3, and (with target extents) the close lists, via the
    compaction scan (:func:`_emit_compact`): each buffer comes back with
    its valid keys compacted to the front (sorted per chunk) plus the
    exact valid count as a device scalar.  The host totals sync makes
    the counts static; `_edge_sort_pass` then sorts just the real edges
    and reads the CSR starts off them.  Replaces both the round-2 counts
    pass (a full second enumeration) and the round-3 global sorts over
    every padded lane (doc/PERF.md)."""
    nlevels = len(lsb) - 1
    (l1tg, l1sg, l1bg), l1_tgt, l1_src, l3g, l4cg = _edge_gens(
        prefixes, box_flags, tgt_row_of_box, ntable, parents,
        dimensions=dimensions, n_away=n_away, lsb=lsb, fast=fast,
        src_levels=src_levels, tgt_levels=tgt_levels, ext=ext,
        ext_data=ext_data, crit=crit, min_nsources=min_nsources)

    def emit_plan(plan, label=""):
        """Run a list of (gen, rows, aux) emissions through the
        compaction scan into one shared buffer; returns (buf, nvalid).
        The buffer is sized for the all-valid worst case (every chunk
        write stays in bounds because the running offset can never
        exceed the lanes already passed)."""
        import os as _os
        trace_log = _os.environ.get("BOXTREE_TPU_TRAV_TIMING") == "1"
        size = 0
        for gen, rows, aux in plan:
            k = jax.eval_shape(
                gen, jax.ShapeDtypeStruct((_ROW_CHUNK,), rows.dtype),
                *[jax.ShapeDtypeStruct((_ROW_CHUNK,), a.dtype)
                  for a in aux]).shape[1]
            if trace_log:
                print(f"# emit[{label}] rows={rows.shape[0]} k={k} "
                      f"lanes={rows.shape[0] * k}", flush=True)
            size += max(1, -(-rows.shape[0] // _ROW_CHUNK)) \
                * _ROW_CHUNK * k
        buf = jnp.full(size, _INVALID_KEY, jnp.int64)
        off = jnp.int64(0)
        for gen, rows, aux in plan:
            buf, off = _emit_compact(gen, rows, aux, buf, off)
        return buf, off

    # List 1.  Fast path: the TARGET side (same-or-coarser sources of
    # each target leaf, the bulk of the list) is emitted in CSR order
    # over target rows with counts-based dense starts — NO post-sort —
    # while the rare cross-level SOURCE-side keys compact into their
    # own small buffer, merged later by one real-edges sort only when
    # nonempty (never for uniform trees).  Generic path: the two-sided
    # key plans + full sort machinery.
    if fast:
        m = 3 ** dimensions

        def plan_size(levels):
            return sum(
                max(1, -(-(ls[lt + 1] - ls[lt]) // _ROW_CHUNK))
                * _ROW_CHUNK * m
                for ls, lt in levels)

        if l1_same_rows and not ext:
            # sources_are_targets: ONE row gather per leaf row serves
            # both sides in a single fused scan
            levels = [(ls_tgt, lt) for lt in range(nlevels)
                      if ls_tgt[lt + 1] > ls_tgt[lt]]
            size = plan_size(levels)
            bufT = jnp.zeros(size, jnp.int64)
            startsT = jnp.zeros(ntarget_boxes + 1 + _ROW_CHUNK,
                                jnp.int64)
            bufS = jnp.full(size, _INVALID_KEY, jnp.int64)
            offT = offS = jnp.int64(0)
            for _ls, lt in levels:
                r0, r1 = ls_tgt[lt], ls_tgt[lt + 1]
                bufT, offT, startsT, bufS, offS = _emit_l1_fast(
                    l1bg(lt), target_boxes[r0:r1], r0,
                    bufT, offT, startsT, bufS, offS)
        else:
            t_plan, s_plan = [], []
            for lt in range(nlevels):
                r0, r1 = ls_tgt[lt], ls_tgt[lt + 1]
                if r1 != r0:
                    t_plan.append((l1tg(lt), target_boxes[r0:r1], r0))
                p0, p1 = ls_part[lt], ls_part[lt + 1]
                if p1 != p0 and lt > 0:
                    rows = part_boxes[p0:p1]
                    if ext:
                        # with target extents INTERNAL boxes carry
                        # nonchild targets, so a source leaf can owe
                        # List-1 entries to SEVERAL coarser target
                        # boxes along one ancestor chain — the clamped
                        # table's one-entry-per-cell source side misses
                        # the intermediate ones (r5 fix; this also
                        # covers ancestors CONTAINING the source leaf,
                        # via the zero offset): per-level generic gen
                        s_plan.append((l1_src(lt), rows,
                                       (rows.astype(jnp.int64),)))
                    else:
                        s_plan.append((l1sg(lt), rows,
                                       (rows.astype(jnp.int64),)))
            size = plan_size([(ls_tgt, lt) for lt in range(nlevels)
                              if ls_tgt[lt + 1] > ls_tgt[lt]])
            bufT = jnp.zeros(size, jnp.int64)
            startsT = jnp.zeros(ntarget_boxes + 1 + _ROW_CHUNK,
                                jnp.int64)
            offT = jnp.int64(0)
            for gen, rows, rb in t_plan:
                bufT, offT, startsT = _emit_rowcsr(
                    gen, rows, rb, bufT, offT, startsT, _ROW_CHUNK,
                    keep64=True)
            bufS, offS = emit_plan(s_plan, 'l1src') if s_plan else (
                jnp.full(1, _INVALID_KEY, jnp.int64), jnp.int64(0))
        startsT = startsT.at[ntarget_boxes].set(offT)
        l1 = (bufT, offT, startsT[:ntarget_boxes + 1], bufS, offS)
    else:
        l1_plan = []
        for lt in range(nlevels):
            r0, r1 = ls_tgt[lt], ls_tgt[lt + 1]
            if r1 == r0:
                continue
            rows = target_boxes[r0:r1]
            l1_plan.append((l1_tgt(lt), rows, (rows.astype(jnp.int64),)))
        for ls in range(1, nlevels):
            if src_levels is not None and not src_levels[ls]:
                continue
            ids_l = jnp.arange(lsb[ls], lsb[ls + 1], dtype=jnp.int32)
            l1_plan.append((l1_src(ls), ids_l,
                            (ids_l.astype(jnp.int64),)))
        l1 = emit_plan(l1_plan, 'l1')

    # List 3 per source level (a level can contribute iff any level at
    # or below it holds source boxes AND some coarser level holds
    # target rows)
    dummy = (jnp.full(1, _INVALID_KEY, jnp.int64), jnp.int64(0))
    l3 = []
    for ls in range(nlevels):
        if ls == 0 or (src_levels is not None
                       and not any(src_levels[ls:])) \
                or (tgt_levels is not None
                    and not any(tgt_levels[:ls])):
            l3.append(dummy)
            continue
        if l3_rows is not None and l3_rows[ls] is not None:
            # pruned rows (_emit_row_prune): only boxes whose parent
            # neighborhood holds coarser target leaves can emit
            ids_l = l3_rows[ls]
            if ids_l.shape[0] == 0:
                l3.append(dummy)
                continue
        else:
            ids_l = jnp.arange(lsb[ls], lsb[ls + 1], dtype=jnp.int32)
        l3.append(emit_plan(
            [(l3g(ls), ids_l, (ids_l.astype(jnp.int64),))],
            f'l3.{ls}'))

    # close lists (target extents only): one CSR each over target rows
    l3c = l4c = dummy
    if ext:
        l3c_plan = []
        for ls in range(1, nlevels):
            ids_l = jnp.arange(lsb[ls], lsb[ls + 1], dtype=jnp.int32)
            l3c_plan.append((l3g(ls, close=True), ids_l,
                             (ids_l.astype(jnp.int64),)))
        l4c_plan = []
        for lb in range(1, nlevels):
            r0, r1 = ls_totp[lb], ls_totp[lb + 1]
            if r1 == r0:
                continue
            rows = totp_boxes[r0:r1]
            l4c_plan.append((l4cg(lb), rows,
                             (rows.astype(jnp.int64),)))
        l3c = emit_plan(l3c_plan)
        l4c = emit_plan(l4c_plan)

    return l1, tuple(l3), (l3c, l4c)


@partial(jax.jit, static_argnames=("nboxes", "nlevels", "l1_total",
                                   "l3_totals", "ext", "l3c_total",
                                   "l4c_total"))
def _edge_sort_pass(l1_buf, l3_bufs, l3c_buf, l4c_buf, target_boxes, *,
                    nboxes, nlevels, l1_total, l3_totals, ext,
                    l3c_total=0, l4c_total=0):
    """Sort each compacted edge buffer's (now statically sized) valid
    prefix and read the CSR starts + nonempty-row counts off it.  These
    sorts run over real edges only — the padded emission lanes never
    see a global sort."""
    def starts_of(keys):
        return _starts_of_box_keys(keys >> np.int64(32), target_boxes,
                                   nboxes)

    # List 1: dense CSR starts via boundary compaction — binary-search
    # the (ntarget_boxes+1) bounds against the ~25x smaller DISTINCT
    # box list instead of every key (the full searchsorted was the
    # dominant cost of this pass at 1e7, doc/PERF.md); the boundary
    # positions compact through one extra key-sized sort
    l1_keys = lax.sort(l1_buf[:l1_total])
    if l1_total:
        rows64 = l1_keys >> np.int64(32)
        l1_bnd = jnp.concatenate(
            [jnp.ones(1, bool), rows64[1:] != rows64[:-1]])
        l1_pos = lax.sort(jnp.where(
            l1_bnd, jnp.arange(l1_total, dtype=jnp.int64),
            jnp.int64(np.iinfo(np.int64).max)))
        nne_l1 = l1_bnd.sum().astype(jnp.int64)
    else:
        l1_pos = jnp.zeros(1, jnp.int64)
        nne_l1 = jnp.int64(0)
    l1 = (l1_keys, l1_pos, nne_l1)

    # List 3 keeps only COMPRESSED (nonempty-row) CSRs, so the dense
    # per-level starts searches over the target rows are replaced by
    # boundary detection on the sorted keys (row changes mark the
    # compressed starts directly).  Boundary positions compact through
    # one key-sized sort, exactly like List 1 above — a sort is ~20x
    # cheaper per element than the scatter-based mask compaction this
    # replaced (doc/PERF.md primitive table).
    dummy = (jnp.full(1, _INVALID_KEY, jnp.int64),
             jnp.zeros(1, jnp.int64), jnp.int64(0))
    l3 = []
    for ls in range(nlevels):
        total = l3_totals[ls]
        if total == 0:
            l3.append(dummy)
            continue
        keys = lax.sort(l3_bufs[ls][:total])
        rows64 = keys >> np.int64(32)
        bnd = jnp.concatenate(
            [jnp.ones(1, bool), rows64[1:] != rows64[:-1]])
        pos = lax.sort(jnp.where(
            bnd, jnp.arange(total, dtype=jnp.int64),
            jnp.int64(np.iinfo(np.int64).max)))
        l3.append((keys, pos, bnd.sum().astype(jnp.int64)))

    l3c = l4c = (dummy[0], dummy[1])
    if ext:
        l3c_keys = lax.sort(l3c_buf[:l3c_total])
        l4c_keys = lax.sort(l4c_buf[:l4c_total])
        l3c = (l3c_keys, starts_of(l3c_keys))
        l4c = (l4c_keys, starts_of(l4c_keys))

    return l1, tuple(l3), (l3c, l4c)


@partial(jax.jit, static_argnames=("nlevels", "l1_nonempty", "l3_totals",
                                   "l3_nonempty", "ext", "fast",
                                   "l1t_total", "l1s_total",
                                   "row_totals"))
def _edge_slice_pass(l1_keys, l1_pos, l1_fast, l3_keys, l3_pos, l3c_keys,
                     l4c_keys, target_boxes, tgt_row_of_box, rowlists, *,
                     nlevels, l1_nonempty, l3_totals, l3_nonempty, ext,
                     fast=False, l1t_total=0, l1s_total=0,
                     row_totals=(0, 0, 0)):
    """Extract the final static-shape lists from the sorted compact key
    buffers (all totals are static by now).  List 3's compressed CSR
    comes straight from the row-boundary masks: the boundary positions
    ARE the compressed starts, and the boundary keys carry the
    nonempty target boxes.

    List 1, fast path: the target side arrives ALREADY in CSR order
    with counts-based dense starts; if the cross-level source side is
    empty (uniform trees) no sort happens at all, otherwise ONE sort
    merges in the (rare) source-side keys and the starts gain the
    side's searchsorted cumulative counts.  Generic path: dense starts
    from one binary search of the row bounds against the distinct
    boxes of the pre-sorted keys."""
    mask32 = np.int64(0xFFFFFFFF)
    ntarget = int(target_boxes.shape[0])
    nboxes = int(tgt_row_of_box.shape[0])
    if fast:
        bufT, startsT, bufS = l1_fast
        if l1s_total == 0:
            l1_lists = (bufT[:l1t_total] & mask32).astype(jnp.int32)
            l1_starts = startsT.astype(jnp.int32)
        else:
            keys_s = bufS[:l1s_total]
            rows_s = tgt_row_of_box[keys_s >> np.int64(32)]
            merged = lax.sort(jnp.concatenate(
                [bufT[:l1t_total],
                 (rows_s << np.int64(32)) | (keys_s & mask32)]))
            l1_lists = (merged & mask32).astype(jnp.int32)
            c2s = _count_below(rows_s, ntarget + 1)
            l1_starts = (startsT + c2s).astype(jnp.int32)
    else:
        l1_lists = (l1_keys & mask32).astype(jnp.int32)
        l1_total = int(l1_keys.shape[0])
        if l1_total and l1_nonempty:
            pos = l1_pos[:l1_nonempty]
            dboxes = l1_keys[pos] >> np.int64(32)
            bounds = jnp.concatenate(
                [target_boxes.astype(jnp.int64),
                 jnp.full(1, nboxes, jnp.int64)])
            idx = jnp.searchsorted(dboxes, bounds).astype(jnp.int64)
            pos_pad = jnp.concatenate(
                [pos, jnp.full(1, l1_total, jnp.int64)])
            l1_starts = pos_pad[idx].astype(jnp.int32)
        else:
            l1_starts = jnp.zeros(target_boxes.shape[0] + 1, jnp.int32)

    l3_out = []
    for ls in range(nlevels):
        total = l3_totals[ls]
        nne = l3_nonempty[ls]
        if total == 0:
            l3_out.append((jnp.zeros(1, jnp.int32),
                           jnp.zeros(0, jnp.int32),
                           jnp.zeros(0, jnp.int32),
                           jnp.zeros(0, jnp.int32)))
            continue
        keys = l3_keys[ls]
        lists = (keys & mask32).astype(jnp.int32)
        pos = l3_pos[ls][:nne]
        comp_starts = jnp.concatenate(
            [pos.astype(jnp.int32), jnp.full(1, total, jnp.int32)])
        tgt_sep = (keys[pos] >> np.int64(32)).astype(jnp.int32)
        ne_rows = tgt_row_of_box[tgt_sep.astype(jnp.int64)].astype(
            jnp.int32)
        l3_out.append((comp_starts, lists, ne_rows, tgt_sep))

    close_out = None
    if ext:
        close_out = ((l3c_keys & mask32).astype(jnp.int32),
                     (l4c_keys & mask32).astype(jnp.int32))

    # rowlist finalization (same program: avoids ~6 tiny dispatches,
    # each ~25 ms through the tunnel)
    row_csr = tuple(
        (starts64.astype(jnp.int32), buf[:total])
        for (starts64, buf), total in zip(rowlists, row_totals))
    return (l1_lists, l1_starts), tuple(l3_out), close_out, row_csr

# }}}


# {{{ builder

def _level_counts_of_mask(mask_np, level_starts):
    nlevels = len(level_starts) - 1
    return [int(mask_np[level_starts[i]:level_starts[i + 1]].sum())
            for i in range(nlevels)]


@partial(jax.jit, static_argnames=("lsb",))
def _mask_level_counts(*masks, lsb):
    """(nmasks, nlevels) int64 per-level True counts — the single tiny
    device->host pull that replaces host-side box-flag processing."""
    nlevels = len(lsb) - 1
    return jnp.stack([
        jnp.stack([m[lsb[i]:lsb[i + 1]].sum() for i in range(nlevels)])
        for m in masks]).astype(jnp.int64)


@jax.jit
def _row_of_box_table(mask):
    """(nboxes,) row index of each True box within the ascending list
    of True boxes (-1 where False) — one cumsum (a searchsorted here
    costs ~0.9 s at 1e7: TPU binary search is a gather loop)."""
    return jnp.where(mask, jnp.cumsum(mask.astype(jnp.int64)) - 1, -1)


@jax.jit
def _pack_totals(*vals):
    flat = [v.reshape(-1).astype(jnp.int64) for v in vals]
    return jnp.concatenate(flat)


def build_traversal(tree, well_sep_is_n_away=1, from_sep_smaller_crit=None,
                    debug=False, _from_sep_smaller_min_nsources_cumul=None,
                    source_boxes_mask=None, source_parent_boxes_mask=None):
    """Build an :class:`FMMTraversalInfo` for *tree*.

    Mirrors ``FMMTraversalBuilder.__call__``
    (``boxtree/traversal.py:1969-2345``), including trees with *target*
    extents (which produce the "close" halves of Lists 3 and 4); source
    extents are rejected like the reference does
    (``boxtree/traversal.py:2002-2006``).

    :arg source_boxes_mask: optional (nboxes,) bool mask; only masked
        boxes enter ``source_boxes`` (restricting P2M in the distributed
        FMM, ``boxtree/traversal.py:332-338``).  Interaction lists are
        unaffected, exactly like the reference.
    :arg source_parent_boxes_mask: same for ``source_parent_boxes``
        (restricting M2M, ``boxtree/traversal.py:340-347``).  Unlike the
        reference, ``target_boxes`` is never masked, even when sources
        are targets.
    """
    if tree.sources_have_extent:
        raise ValueError("source extents not supported in traversal "
                         "(same restriction as the reference, "
                         "boxtree/traversal.py:2002-2006)")

    ext = bool(getattr(tree, "targets_have_extent", False))
    crit = from_sep_smaller_crit
    if crit is None:
        crit = "precise_linf"
    if crit not in ("static_linf", "precise_linf", "static_l2"):
        raise ValueError(f"unexpected value of 'from_sep_smaller_crit': "
                         f"{crit}")
    if ext and tree.extent_norm == "l2" and crit == "static_linf":
        # mirrors boxtree/traversal.py:1786-1793
        raise ValueError("the static l^inf from-sep-smaller criterion "
                         "cannot be used with the l^2 extent norm")
    min_nsources = int(_from_sep_smaller_min_nsources_cumul or 0)

    d = tree.dimensions
    n_away = well_sep_is_n_away
    nlevels = tree.nlevels
    nboxes = tree.nboxes
    lsb = tree.level_start_box_nrs       # host tuple, len nlevels+1

    flags_dev = tree.box_flags
    prefixes = tree.box_morton_prefixes

    # {{{ basic box lists (all on device: pulling box_flags or a box
    # list to the host costs seconds at 1e7 through the tunnel —
    # device->host transfers run at ~MB/s there.  The only pull is ONE
    # packed (nmasks, nlevels) level-count table.)

    src_mask = (flags_dev & _F.IS_SOURCE_BOX) != 0
    src_parent_mask = (flags_dev & _F.HAS_SOURCE_CHILD_BOXES) != 0
    tgt_mask = (flags_dev & _F.IS_TARGET_BOX) != 0
    totp_mask = (flags_dev & (_F.IS_TARGET_BOX
                              | _F.HAS_TARGET_CHILD_BOXES)) != 0

    src_list_mask = src_mask
    if source_boxes_mask is not None:
        src_list_mask = src_mask & jnp.asarray(source_boxes_mask, bool)
    src_parent_list_mask = src_parent_mask
    if source_parent_boxes_mask is not None:
        src_parent_list_mask = src_parent_mask & jnp.asarray(
            source_parent_boxes_mask, bool)

    sources_are_targets = getattr(tree, "sources_are_targets", True)
    # slot 3 = UNMASKED source boxes (interaction lists ignore the
    # distributed masks; static level skips read these counts)
    mask_list = [src_list_mask, src_parent_list_mask, totp_mask,
                 src_mask]
    # target rows / List-1 participant rows (fast path: every
    # source-or-target leaf emits both List-1 sides from its one
    # clamped table row)
    tgt_sel = None          # index into mask_list, or None = src slot
    part_sel = None
    if sources_are_targets:
        if source_boxes_mask is not None:
            tgt_sel = part_sel = 3          # unmasked sources
    else:
        mask_list.append(tgt_mask)
        tgt_sel = len(mask_list) - 1
        mask_list.append(src_mask | tgt_mask)
        part_sel = len(mask_list) - 1

    counts_tbl = np.asarray(jax.device_get(_mask_level_counts(
        *mask_list, lsb=lsb)))

    def make_list(i):
        counts = counts_tbl[i]
        total = int(counts.sum())
        lst = _mask_to_list(mask_list[i], total=total)
        level_starts = tuple(
            int(x) for x in np.concatenate([[0], np.cumsum(counts)]))
        return lst, level_starts

    source_boxes, ls_src = make_list(0)
    source_parent_boxes, ls_srcp = make_list(1)
    target_or_target_parent_boxes, ls_totp = make_list(2)
    src_level_counts = [int(c) for c in counts_tbl[3]]
    if tgt_sel is None:
        target_boxes, ls_tgt = source_boxes, ls_src
    else:
        target_boxes, ls_tgt = make_list(tgt_sel)
    if part_sel is None or part_sel == tgt_sel:
        part_boxes, ls_part = target_boxes, ls_tgt
    else:
        part_boxes, ls_part = make_list(part_sel)

    ntarget_boxes = ls_tgt[-1]
    tgt_row_of_box_dev = _row_of_box_table(
        mask_list[0 if tgt_sel is None else tgt_sel])

    # }}}

    # optional stage timing (BOXTREE_TPU_TRAV_TIMING=1): wall time per
    # jitted pass, synchronized; for the perf log in doc/PERF.md
    import os as _os
    import time as _time
    _timing = _os.environ.get("BOXTREE_TPU_TRAV_TIMING") == "1"

    def _tic():
        return _time.perf_counter() if _timing else None

    def _toc(name, t0, *sync):
        if _timing:
            # force completion with ONE packed scalar pull over every
            # output (jax.block_until_ready is a no-op through the axon
            # tunnel — execution is fully lazy; only host pulls force
            # it.  Pulling each array separately costs one ~25 ms round
            # trip per array AND leaves unpulled outputs to finalize
            # inside the NEXT stage's timing).
            last = [x.ravel()[-1:].astype(jnp.int32) for x in sync
                    if hasattr(x, "ravel") and getattr(x, "size", 0)
                    and x.dtype != bool]
            if last:
                jax.device_get(jnp.concatenate(last))
            print(f"# trav {name}: {_time.perf_counter() - t0:.3f}s",
                  flush=True)

    _t = _tic()
    _toc("box_lists", _t, source_boxes, source_parent_boxes,
         target_or_target_parent_boxes, target_boxes, part_boxes,
         tgt_row_of_box_dev)
    _t = _tic()

    # neighbor table (fast paths).  fast == 1: the full n_away == 1
    # path (every list off the clamped radius-1 table); fast == 2: the
    # n_away >= 2 partial path — slnws / List 2 / List 1 off a
    # radius-n clamped table, Lists 3/4 through the generic
    # Morton-search generators (their n >= 2 membership rules mix
    # touching and colleague criteria across levels).  With-extent
    # traversals (r4): slnws / List 2 / List 1 are pure integer-cell
    # criteria — extent-INDEPENDENT — so they ride the same table;
    # only Lists 3/4 and the close lists, whose membership tests the
    # stick-out-stretched separation criteria per ancestor level, stay
    # on the generic generators (the gens check ``ext`` themselves).
    # Entries pack the IS_SOURCE / is-target-row bits (neighbors.py).
    fast = 0
    if nboxes < (1 << 29):
        fast = 1 if n_away == 1 else 2
    parents_dev = tree.box_parent_ids
    child_rows_dev = jnp.asarray(tree.box_child_ids).T.astype(jnp.int32)
    if fast:
        ntable = nbr.build_neighbor_table(
            prefixes, tree.box_parent_ids, tree.box_child_ids,
            flags_dev, tgt_row_of_box_dev >= 0,
            dimensions=d, lsb=lsb, radius=n_away)
    else:
        ntable = jnp.zeros((1, 1), jnp.int32)
    _toc("neighbor_table", _t, ntable)

    # which levels carry source / target boxes at all (static skips) —
    # from the UNMASKED flags: interaction lists ignore the masks
    src_levels = tuple(c > 0 for c in src_level_counts)
    tgt_levels = tuple(ls_tgt[i + 1] > ls_tgt[i] for i in range(nlevels))

    # geometry / extent data for the with-extent criteria
    bbox_min_dev = tree.box_centers[:, 0] - 0.5 * jnp.asarray(
        tree.root_extent)
    root_extent_dev = jnp.asarray(tree.root_extent, jnp.float64)
    if ext:
        sof_dev = jnp.asarray(tree.stick_out_factor, jnp.float64)
        ext_data = (
            tree.box_source_counts_cumul,
            tree.box_target_bounding_box_min,
            tree.box_target_bounding_box_max,
            bbox_min_dev, root_extent_dev, sof_dev)
    else:
        z = jnp.zeros(0, jnp.float64)
        sof_dev = jnp.float64(0)
        ext_data = (z, z, z, bbox_min_dev, root_extent_dev, sof_dev)

    _t = _tic()

    # emission-row pruning (fast modes): childless List-2 parents and
    # target-free List-3 parent neighborhoods only produce dead lanes —
    # one tiny program + one packed counts pull makes the kept row
    # counts static, so the emit passes enumerate only live rows
    l2_rows = l3_rows = None
    if fast:
        l2_full, l3_full, prune_counts = _emit_row_prune(
            ntable, parents_dev, child_rows_dev, flags_dev, lsb=lsb)
        pc = jax.device_get(prune_counts)
        l2_rows = tuple(
            l2_full[lev][:int(pc[0, lev])]
            for lev in range(nlevels - 1)) + (None,)
        if not ext:
            # (with target extents List 3 probes windows around EVERY
            # ancestor, not just the parent row — keep all rows there)
            l3_rows = (None,) + tuple(
                l3_full[lev][:int(pc[1, lev])]
                for lev in range(1, nlevels))
    _toc("row_prune", _t)
    _t = _tic()

    # single-enumeration rowlist construction (slnws / List 2 / List 4):
    # the compaction scan emits each list already in CSR order and reads
    # the dense starts off the chunk-sorted keys — no counts pass
    ((slnws_starts64, slnws_buf, slnws_tot),
     (l2_starts64, l2_buf, l2_tot),
     (l4_starts64, l4_buf, l4_tot)) = _rowlists_emit_pass(
        prefixes, target_or_target_parent_boxes, flags_dev, ntable,
        parents_dev, child_rows_dev, bbox_min_dev, root_extent_dev,
        sof_dev, l2_rows, dimensions=d, n_away=n_away, lsb=lsb,
        ls_totp=ls_totp, fast=fast, src_levels=src_levels, ext=ext)
    _toc("emit_rowlists", _t, slnws_buf, l2_buf, l4_buf,
         slnws_starts64, l2_starts64, l4_starts64)
    _t = _tic()

    # single-enumeration edge construction: the compaction scan emits
    # every edge key and compacts the valid ones to the buffer front
    # with an exact device-scalar count (no global sort over the ~90%
    # invalid padded lanes — doc/PERF.md)
    l1_em, l3_em, (l3c_em, l4c_em) = (
        _edge_emit_pass(
            prefixes, target_boxes, part_boxes, flags_dev,
            tgt_row_of_box_dev, ntable, parents_dev,
            target_or_target_parent_boxes, ext_data, l3_rows,
            dimensions=d,
            n_away=n_away, lsb=lsb, ls_tgt=ls_tgt, ls_part=ls_part,
            ntarget_boxes=ntarget_boxes, fast=fast,
            src_levels=src_levels, tgt_levels=tgt_levels,
            ls_totp=ls_totp, ext=ext, crit=crit,
            min_nsources=min_nsources,
            l1_same_rows=part_boxes is target_boxes))
    if fast:
        l1t_buf, l1t_tot, l1t_starts, l1s_buf, l1s_tot = l1_em
        l1_buf, l1_tot = jnp.zeros(1, jnp.int64), jnp.int64(0)
    else:
        l1_buf, l1_tot = l1_em
        l1t_buf = l1t_starts = l1s_buf = None
        l1t_tot = l1s_tot = jnp.int64(0)

    _toc("emit_edges", _t, l1_buf if not fast else l1t_buf,
         *(() if not fast else (l1t_starts, l1s_buf)),
         *(l3_em[ls][0] for ls in range(nlevels)))
    _t = _tic()

    # first host sync: every list size
    packed = jax.device_get(_pack_totals(
        slnws_tot, l2_tot, l4_tot, l1_tot, l3c_em[1], l4c_em[1],
        l1t_tot, l1s_tot,
        jnp.stack([l3_em[ls][1] for ls in range(nlevels)])))
    (slnws_total, l2_total, l4_total, l1_total, l3c_total, l4c_total,
     l1t_total, l1s_total) = (int(packed[i]) for i in range(8))
    l3_totals = tuple(int(x) for x in packed[8:8 + nlevels])

    _toc("host_sync", _t)
    if _timing:
        print(f"# totals: slnws={slnws_total} l2={l2_total} "
              f"l4={l4_total} l1={l1_total} l1t={l1t_total} "
              f"l1s={l1s_total} l3={sum(l3_totals)}", flush=True)
    _t = _tic()

    # sort the real edges (static sizes now); the second sync pulls
    # only the nonempty-row counts (nlevels + 1 ints)
    ((l1_keys, l1_pos, nne_l1), l3_srt,
     (l3c_srt, l4c_srt)) = _edge_sort_pass(
        l1_buf, tuple(l3_em[ls][0] for ls in range(nlevels)),
        l3c_em[0], l4c_em[0], target_boxes, nboxes=nboxes,
        nlevels=nlevels, l1_total=l1_total, l3_totals=l3_totals,
        ext=ext, l3c_total=l3c_total, l4c_total=l4c_total)
    ne_packed = jax.device_get(jnp.stack(
        [nne_l1] + [l3_srt[ls][2] for ls in range(nlevels)]))
    l1_nonempty = int(ne_packed[0])
    l3_nonempty = tuple(int(x) for x in ne_packed[1:])
    _toc("sort_edges", _t, l1_keys, l1_pos,
         *(l3_srt[ls][0] for ls in range(nlevels)),
         *(l3_srt[ls][1] for ls in range(nlevels)))
    _t = _tic()

    l1_fast = ((l1t_buf, l1t_starts, l1s_buf) if fast
               else (jnp.zeros(1, jnp.int64),) * 3)
    ((l1_lists, l1_starts), l3_csr, close_lists,
     row_csr) = _edge_slice_pass(
        l1_keys, l1_pos, l1_fast,
        tuple(l3_srt[ls][0] for ls in range(nlevels)),
        tuple(l3_srt[ls][1] for ls in range(nlevels)),
        l3c_srt[0], l4c_srt[0], target_boxes, tgt_row_of_box_dev,
        ((slnws_starts64, slnws_buf), (l2_starts64, l2_buf),
         (l4_starts64, l4_buf)),
        nlevels=nlevels, l1_nonempty=l1_nonempty, l3_totals=l3_totals,
        l3_nonempty=l3_nonempty, ext=ext, fast=fast,
        l1t_total=l1t_total, l1s_total=l1s_total,
        row_totals=(slnws_total, l2_total, l4_total))
    ((slnws_starts, slnws_lists), (l2_starts, l2_lists),
     (l4_starts, l4_lists)) = row_csr
    close_csr = None
    if ext:
        close_csr = ((l3c_srt[1], close_lists[0]),
                     (l4c_srt[1], close_lists[1]))
    _toc("slice_edges", _t, l1_lists, l1_starts,
         slnws_starts, slnws_lists, l2_starts, l2_lists, l4_starts,
         l4_lists, *(l3_csr[ls][1] for ls in range(nlevels)),
         *(l3_csr[ls][0] for ls in range(nlevels)))

    from_sep_smaller_by_level = []
    target_boxes_sep_smaller = []
    for ls_lev in range(nlevels):
        comp_starts, lists, ne_rows, tgt_sep = l3_csr[ls_lev]
        from_sep_smaller_by_level.append(BuiltList(
            count=l3_totals[ls_lev],
            starts=comp_starts,
            lists=lists,
            num_nonempty_lists=l3_nonempty[ls_lev],
            nonempty_indices=ne_rows))
        target_boxes_sep_smaller.append(tgt_sep)

    def level_starts_arr(t):
        return jnp.asarray(np.asarray(t, dtype=np.int32))

    logger.info(
        "build_traversal: %d boxes, wsn=%d, edges l1=%d l2=%d l3=%d l4=%d",
        tree.nboxes, n_away, int(l1_lists.shape[0]),
        int(l2_lists.shape[0]), sum(int(t) for t in l3_totals),
        int(l4_lists.shape[0]))

    return FMMTraversalInfo(
        tree=tree,
        well_sep_is_n_away=n_away,
        source_boxes=source_boxes,
        target_boxes=target_boxes,
        level_start_source_box_nrs=level_starts_arr(ls_src),
        level_start_target_box_nrs=level_starts_arr(ls_tgt),
        source_parent_boxes=source_parent_boxes,
        level_start_source_parent_box_nrs=level_starts_arr(ls_srcp),
        target_or_target_parent_boxes=target_or_target_parent_boxes,
        level_start_target_or_target_parent_box_nrs=level_starts_arr(
            ls_totp),
        same_level_non_well_sep_boxes_starts=slnws_starts,
        same_level_non_well_sep_boxes_lists=slnws_lists,
        neighbor_source_boxes_starts=l1_starts,
        neighbor_source_boxes_lists=l1_lists,
        from_sep_siblings_starts=l2_starts,
        from_sep_siblings_lists=l2_lists,
        from_sep_smaller_by_level=tuple(from_sep_smaller_by_level),
        target_boxes_sep_smaller_by_source_level=tuple(
            target_boxes_sep_smaller),
        from_sep_close_smaller_starts=(
            close_csr[0][0] if ext else None),
        from_sep_close_smaller_lists=(
            close_csr[0][1] if ext else None),
        from_sep_bigger_starts=l4_starts,
        from_sep_bigger_lists=l4_lists,
        from_sep_close_bigger_starts=(
            close_csr[1][0] if ext else None),
        from_sep_close_bigger_lists=(
            close_csr[1][1] if ext else None),
    )


def merge_close_lists(trav):
    """Merge the close lists into List 1 and return a new traversal with
    the close lists set to *None* (mirrors ``boxtree/traversal.py``
    ``FMMTraversalInfo.merge_close_lists``, ``:1650-1693``).  All three
    inputs are CSR lists over ``target_boxes`` rows."""
    import dataclasses

    nrows = trav.ntarget_boxes

    def edges(starts, lists):
        from boxtree_tpu.models.particle_blocks import csr_rows
        return (csr_rows(starts, int(lists.shape[0])),
                lists.astype(jnp.int64))

    parts = [edges(trav.neighbor_source_boxes_starts,
                   trav.neighbor_source_boxes_lists),
             edges(trav.from_sep_close_smaller_starts,
                   trav.from_sep_close_smaller_lists),
             edges(trav.from_sep_close_bigger_starts,
                   trav.from_sep_close_bigger_lists)]
    rows = jnp.concatenate([p[0] for p in parts])
    vals = jnp.concatenate([p[1] for p in parts])
    keys = lax.sort((rows << np.int64(32)) | vals)
    starts = _starts_of_rows(keys >> np.int64(32), nrows)
    lists = (keys & np.int64(0xFFFFFFFF)).astype(jnp.int32)

    return dataclasses.replace(
        trav,
        neighbor_source_boxes_starts=starts,
        neighbor_source_boxes_lists=lists,
        from_sep_close_smaller_starts=None,
        from_sep_close_smaller_lists=None,
        from_sep_close_bigger_starts=None,
        from_sep_close_bigger_lists=None)


class FMMTraversalBuilder:
    """API-parity wrapper mirroring ``boxtree.traversal.FMMTraversalBuilder``."""

    def __init__(self, actx=None, well_sep_is_n_away=1,
                 from_sep_smaller_crit=None):
        if isinstance(actx, int):
            # no array-context argument: the positional form is
            # (well_sep_is_n_away[, from_sep_smaller_crit])
            if from_sep_smaller_crit is not None:
                raise TypeError(
                    "FMMTraversalBuilder: pass the array context first "
                    "or use keyword arguments")
            actx, well_sep_is_n_away, from_sep_smaller_crit = (
                None, actx,
                None if well_sep_is_n_away == 1 else well_sep_is_n_away)
        if not isinstance(well_sep_is_n_away, int) or well_sep_is_n_away < 1:
            raise TypeError(
                f"well_sep_is_n_away must be a positive int, got "
                f"{well_sep_is_n_away!r}")
        if from_sep_smaller_crit not in (
                None, "static_linf", "precise_linf", "static_l2"):
            raise ValueError(
                f"bad from_sep_smaller_crit: {from_sep_smaller_crit!r}")
        self.well_sep_is_n_away = well_sep_is_n_away
        self.from_sep_smaller_crit = from_sep_smaller_crit

    def __call__(self, tree_or_actx, tree=None, **kwargs):
        if tree is None:
            tree = tree_or_actx
        return build_traversal(
            tree, well_sep_is_n_away=self.well_sep_is_n_away,
            from_sep_smaller_crit=self.from_sep_smaller_crit, **kwargs)

# }}}
