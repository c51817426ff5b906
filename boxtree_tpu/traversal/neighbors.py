"""Per-box neighbor tables and gather-based interaction-list generators.

The generic traversal generators locate candidate boxes with binary
searches into per-level Morton tables — O(log nboxes) serial gather
rounds per candidate, which dominates traversal time on TPU (gathers are
the scarce resource).  For the default ``well_sep_is_n_away == 1`` these
are replaced by the classic *neighbor table*: ``table[b, j]`` is the box
at ``cell(b) + delta_j`` on ``b``'s own level (or -1), built top-down
with two gathers per entry via the parent's table::

    parent_of(cell + delta) = parent_cell + ((cell & 1) + delta) >> 1
    table[b, j] = child(table[parent(b), col], digit(cell + delta))

Every list candidate is then one table gather plus pure integer
arithmetic (candidate *cells* are reconstructed from static column
offsets, so adjacency predicates need no further memory access).

The table entries additionally pack the two predicate bits every list
needs — IS_SOURCE_BOX and "is a target-list row" — into spare high bits
of the int32 id (bits 29/30; box ids are < 2^29).  This makes candidate
filtering *zero extra gathers*: the per-candidate ``box_flags[cand]`` /
``tgt_row_of_box[cand]`` random gathers of the naive formulation (the
round-1 bottleneck, doc/PERF.md) disappear, and edge keys are emitted in
box-id space (``tgt_box << 32 | src``) so no row translation is needed
until the final CSR starts computation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from boxtree_tpu.ops import morton
from boxtree_tpu.tree.containers import box_flags_enum

_F = box_flags_enum
_INVALID_KEY = np.int64(np.iinfo(np.int64).max)

#: packed neighbor-table layout: low 29 bits id, bit 29 IS_SOURCE_BOX,
#: bit 30 "row of target_boxes"; -1 = absent
ID_MASK = np.int32((1 << 29) - 1)
SRC_BIT = np.int32(1 << 29)
TGT_BIT = np.int32(1 << 30)


def _offsets1(dimensions):
    from boxtree_tpu.traversal.build import _offsets
    return _offsets(dimensions, 1)


@partial(jax.jit, static_argnames=("dimensions", "lsb"))
def build_neighbor_table(prefixes, parents, child_ids, box_flags,
                         tgt_box_mask, *, dimensions, lsb):
    """(nboxes, 3^d) same-level neighbor entries (-1 where absent);
    column order matches ``_offsets(d, 1)``, center column = self.
    Entries pack the candidate-filter bits (see module doc).

    Built PARENT-side: level lev-1 is a contiguous slice of the table
    (no gather at all to read it), the children of all 3^d neighbor
    entries arrive in ONE row-gather per parent, and the
    (child digit, column) -> (parent column, child digit) index maps are
    fully static, so each level costs ~3^d/2^d gather lanes per box
    instead of the 2*3^d scattered lanes of the child-side build.
    """
    d = dimensions
    offs = _offsets1(d)                      # (m, d) numpy
    m = offs.shape[0]
    nchild = 2 ** d
    nboxes = lsb[-1]
    nlevels = len(lsb) - 1
    col_w = 3 ** (d - 1 - np.arange(d))      # column weights (axis 0 slowest)

    iota = jnp.arange(nboxes, dtype=jnp.int32)
    ent = (iota
           | jnp.where((box_flags & _F.IS_SOURCE_BOX) != 0, SRC_BIT, 0)
           | jnp.where(tgt_box_mask, TGT_BIT, 0)).astype(jnp.int32)
    # (nboxes, 2^d) packed entry of each child (-1 absent)
    child_ent = jnp.where(
        child_ids.T > 0,
        ent[jnp.clip(child_ids.T, 0).astype(jnp.int64)],
        np.int32(-1))

    # static maps: child digit q's neighbor at offs[j] is the child with
    # digit cdig[q, j] of the parent's neighbor in column pcol[q, j]
    #   cell(child q) + delta = 2*pcell + q + delta
    #   -> parent cell offset (q + delta) >> 1, child digit (q+delta) & 1
    pcol = np.zeros((nchild, m), np.int64)
    cdig = np.zeros((nchild, m), np.int64)
    for q in range(nchild):
        qb = np.array([(q >> (d - 1 - a)) & 1 for a in range(d)])
        for j in range(m):
            dp = (qb + offs[j]) >> 1
            pcol[q, j] = ((dp + 1) * col_w).sum()
            cdig[q, j] = (((qb + offs[j]) & 1)
                          << (d - 1 - np.arange(d))).sum()

    table = jnp.full((nboxes, m), -1, jnp.int32)
    table = table.at[0, m // 2].set(ent[0])

    for lev in range(1, nlevels):
        b0, b1 = lsb[lev], lsb[lev + 1]
        p0, p1 = lsb[lev - 1], lsb[lev]
        pn = table[p0:p1]                                  # (P, m) slice
        pid = (jnp.clip(pn, 0) & ID_MASK).astype(jnp.int64)
        ch = child_ent[pid]                                # (P, m, 2^d)
        ch = jnp.where((pn >= 0)[:, :, None], ch, np.int32(-1))
        # (P, 2^d, m) candidate table rows for every potential child
        eq = []
        for q in range(nchild):
            eq.append(jnp.stack(
                [ch[:, int(pcol[q, j]), int(cdig[q, j])]
                 for j in range(m)], axis=1))
        eall = jnp.stack(eq, axis=1).reshape((p1 - p0) * nchild, m)
        # compact to the level's existing boxes: children are numbered
        # (parent-ascending, digit-ascending), i.e. box id order
        par = parents[jnp.arange(b0, b1, dtype=jnp.int64)].astype(
            jnp.int64)
        digit = (prefixes[b0:b1] & (nchild - 1)).astype(jnp.int64)
        rows = (par - p0) * nchild + digit
        table = table.at[b0:b1].set(eall[rows])

    return table


# {{{ helpers shared by the fast generators

def _touch_off(off_cells, level_a, own_extra_bits, level_b):
    """Touch test where the candidate box at coarser ``level_a`` sits at
    (own ancestor cell + static offset) and the fine box's cell is
    (ancestor cell << s) + low bits: the ancestor cell cancels, leaving
    pure offset arithmetic.

    candidate cell  q = anc + off
    fine cell       c = (anc << s) + low           (s = level_b - level_a)
    touch <=> (q << s) <= c + 1  and  c <= (q + 1) << s
          <=> (off << s) <= low + 1 and low <= (off + 1) << s
    """
    s = level_b - level_a
    lo = off_cells << np.int64(s)
    hi = (off_cells + 1) << np.int64(s)
    return ((lo <= own_extra_bits + 1)
            & (own_extra_bits <= hi)).all(axis=0)


def _low_bits(cells, nbits):
    """The nbits low bits of each cell coordinate."""
    if nbits <= 0:
        return jnp.zeros_like(cells)
    return cells & ((np.int64(1) << np.int64(nbits)) - 1)

# }}}


# {{{ fast generators (rows are box-id chunks at one static level)

def fgen_slnws(rows, ntable, *, dimensions):
    """Colleagues = neighbor-table row without the center column."""
    m = 3 ** dimensions
    t = ntable[jnp.clip(rows, 0).astype(jnp.int64)]
    keep = np.arange(m) != m // 2
    t = t[:, keep]
    return jnp.where(t >= 0, t & ID_MASK, -1)


def _list2_valid_pairs(dimensions):
    """For each child digit r: the static list of (neighbor column j,
    child digit q) whose candidate is well-separated from r — i.e. the
    List-2 window, enumerated once per *parent*."""
    d = dimensions
    offs = _offsets1(d)
    nchild = 2 ** d

    def bits(q):
        return np.array([(q >> (d - 1 - a)) & 1 for a in range(d)])

    pairs = []
    for r in range(nchild):
        lst = []
        for j in range(len(offs)):
            for q in range(nchild):
                off = 2 * offs[j] + bits(q) - bits(r)
                if (np.abs(off) > 1).any():
                    lst.append((j, q))
        pairs.append(lst)
    return pairs


def fgen_list2_parent(prows, ntable, child_rows, *, dimensions):
    """List-2 candidates enumerated from the PARENT level: one
    neighbor-table row plus 3^d child-row gathers per parent serve all
    2^d children (the per-(column, digit) well-separation test is fully
    static).  Returns ``(cand, own)`` with ``cand`` (B, 2^d, K) candidate
    box ids (-1 invalid) and ``own`` (B, 2^d) the child boxes owning each
    candidate row (0 = absent child)."""
    rows_i = jnp.clip(prows, 0).astype(jnp.int64)
    return list2_from_parent_rows(ntable[rows_i], child_rows[rows_i],
                                  child_rows, dimensions=dimensions)


def list2_from_parent_rows(pn, own, child_rows, *, dimensions):
    """Core of :func:`fgen_list2_parent` over already-gathered parent
    neighbor rows ``pn`` (B, 3^d) and child entries ``own`` (B, 2^d) —
    also the sharded-traversal entry point, where each device holds its
    OWNED neighbor-table rows directly
    (:func:`boxtree_tpu.parallel.shard_build.sharded_l2_edges`)."""
    d = dimensions
    m = 3 ** d
    nchild = 2 ** d

    cand_jq = {}
    for j in range(m):
        pnj = pn[:, j]
        ch = child_rows[jnp.clip(pnj, 0) & ID_MASK]     # (B, nchild)
        ok = pnj >= 0
        for q in range(nchild):
            c = ch[:, q]
            cand_jq[(j, q)] = jnp.where(ok & (c > 0), c, -1)

    pairs = _list2_valid_pairs(d)
    cand = jnp.stack(
        [jnp.stack([cand_jq[jq] for jq in pairs[r]], axis=1)
         for r in range(nchild)], axis=1)               # (B, nchild, K)
    return jnp.where(own[..., None] > 0, cand, -1), own


def fgen_list2(rows, ntable, child_rows, parents, prefixes, *, dimensions):
    """Children of parent's neighbors that are >1 away: candidate cell
    offsets are fully static per (neighbor column, child digit); each
    neighbor's children come from ONE row gather of the transposed
    child table instead of 2^d scalar gathers."""
    d = dimensions
    m = 3 ** d
    nchild = 2 ** d
    offs = _offsets1(d)
    rows_i = jnp.clip(rows, 0).astype(jnp.int64)
    pn = ntable[parents[rows_i].astype(jnp.int64)]          # (B, m)
    own_digit = (prefixes[rows_i] & (nchild - 1)).astype(jnp.int64)
    r_bits = jnp.stack([(own_digit >> (d - 1 - a)) & 1
                        for a in range(d)])                 # (d, B)
    out = []
    for j in range(m):
        pnj = pn[:, j]
        ch = child_rows[jnp.clip(pnj, 0) & ID_MASK]         # (B, nchild)
        for q in range(nchild):
            cand = ch[:, q]
            q_bits = np.array([(q >> (d - 1 - a)) & 1 for a in range(d)])
            off = (2 * offs[j] + q_bits)[:, None] - r_bits  # (d, B)
            wellsep = (jnp.abs(off) > 1).any(axis=0)
            valid = (pnj >= 0) & (cand > 0) & wellsep
            out.append(jnp.where(valid, cand, -1))
    return jnp.stack(out, axis=1)


def _ancestors(rows, parents, nsteps):
    """List of ancestor id arrays [self, parent, grandparent, ...]."""
    out = [jnp.clip(rows, 0).astype(jnp.int64)]
    for _ in range(nsteps):
        out.append(parents[out[-1]].astype(jnp.int64))
    return out


def _cross_window(cells, s, dimensions):
    """The <= 2^d coarse candidates touching a fine box.

    A box at level lc = lf - s (s >= 1) touches the fine box with cell
    ``cells`` iff per axis its cell is the containing ancestor cell or —
    only when the fine cell sits on the corresponding s-level cell
    boundary — the one adjacent cell on that side:

        low == 0       -> ancestor - 1 also touches
        low == 2^s - 1 -> ancestor + 1 also touches

    Returns ``(delta, valid)``: per-axis offsets (d, B, 2^d) relative to
    the fine box's level-lc ancestor cell and combo validity (B, 2^d);
    combo 0 is the containing ancestor itself.  This replaces the 3^d
    per-coarse-level candidate window of the naive enumeration.
    """
    d = dimensions
    low = _low_bits(cells, s)                               # (d, B)
    top = (np.int64(1) << np.int64(s)) - 1
    dir_ = jnp.where(low == 0, np.int64(-1),
                     jnp.where(low == top, np.int64(1), np.int64(0)))
    bits = np.array([[(t >> (d - 1 - a)) & 1 for t in range(2 ** d)]
                     for a in range(d)], np.int64)          # (d, 2^d)
    delta = dir_[:, :, None] * bits[:, None, :]             # (d, B, 2^d)
    valid = ((dir_[:, :, None] != 0) | (bits[:, None, :] == 0)).all(axis=0)
    return delta, valid


def _window_lookup(ntable, anc, delta, dimensions):
    """Gather the <= 2^d windowed entries: ONE row gather of the
    ancestor's 3^d neighbor row plus a one-hot column select on the
    VPU.  Measured on v5e (scripts/tpu_microbench_r4.py): 5.1 ns/lane
    vs 15.7 ns/lane for flat scalar gathers ``ntable[anc, col]`` —
    row gathers move contiguous (1, 3^d) blocks, scalar gathers pay
    per lane."""
    d = dimensions
    m = 3 ** d
    col_w = jnp.asarray(3 ** (d - 1 - np.arange(d)), jnp.int64)
    col = ((delta + 1) * col_w[:, None, None]).sum(axis=0)  # (B, 2^d)
    row = ntable[anc]                                       # (B, m)
    sel = col[:, :, None] == jnp.arange(m, dtype=col.dtype)
    # exactly one column matches per lane; max with -1 fill selects it
    return jnp.where(sel, row[:, None, :], np.int32(-1)).max(axis=2)


def fgen_list4(rows, ntable, parents, prefixes, *, lb,
               dimensions, k_pad, src_levels=None):
    """List 4 at target level lb: neighbors of each strict ancestor
    (levels lb-1 .. 1) that are source boxes, not touching the row box,
    but touching its parent.  The parent level contributes its full 3^d
    neighbor row; the deeper ancestor levels contribute ONE reduced
    <= 2^d window: for a fixed window combo, the valid candidates across
    levels all contain the same point just outside the parent's corner,
    so they form an ancestor chain of which at most one is a source
    leaf (= has SRC_BIT in the no-extent fast path) — a max-reduce over
    levels replaces the per-level lanes (round-4 lane pruning; the
    emission sorts pay per lane, doc/PERF.md)."""
    d = dimensions
    m = 3 ** d
    offs = jnp.asarray(_offsets1(d).T)                      # (d, m)
    cells = morton.deinterleave(
        prefixes[jnp.clip(rows, 0).astype(jnp.int64)], d)
    pcells = cells >> np.int64(1)
    par = parents[jnp.clip(rows, 0).astype(jnp.int64)].astype(jnp.int64)
    anc = _ancestors(par.astype(jnp.int32), parents, max(0, lb - 2))
    chunks = []
    if lb >= 2 and (src_levels is None or src_levels[lb - 1]):
        # wl == lb - 1: all neighbors of the parent touch the parent
        cand = ntable[anc[0]]                               # (B, m)
        is_src = (cand & SRC_BIT) != 0
        low_b = _low_bits(cells, 1)
        not_touch_b = ~_touch_off(offs[:, None, :], lb - 1,
                                  low_b[:, :, None], lb)
        valid = (cand >= 0) & is_src & not_touch_b
        chunks.append(jnp.where(valid, cand & ID_MASK, -1))
    best = None
    for wl in range(lb - 2, 0, -1):
        if src_levels is not None and not src_levels[wl]:
            continue
        # touching the parent -> the parent's cross window at wl
        delta, dvalid = _cross_window(pcells, lb - 1 - wl, d)
        cand = _window_lookup(ntable, anc[lb - 1 - wl], delta, d)
        is_src = (cand & SRC_BIT) != 0
        low_b = _low_bits(cells, lb - wl)
        not_touch_b = ~_touch_off(delta, wl, low_b[:, :, None], lb)
        valid = dvalid & (cand >= 0) & is_src & not_touch_b
        masked = jnp.where(valid, cand & ID_MASK, -1)
        best = masked if best is None else jnp.maximum(best, masked)
    if best is not None:
        chunks.append(best)
    if not chunks:
        return jnp.full((rows.shape[0], k_pad), -1, jnp.int32)
    block = jnp.concatenate(chunks, axis=1)
    if block.shape[1] < k_pad:
        block = jnp.concatenate(
            [block,
             jnp.full((rows.shape[0], k_pad - block.shape[1]), -1,
                      jnp.int32)], axis=1)
    return block


def fgen_list1_target_side(rows, row_boxes, ntable, parents,
                           prefixes, *, lt, dimensions, src_levels=None):
    """Keys (tgt_box<<32|src) for source boxes at levels <= lt touching
    each target box: the box's own neighbor row at its level plus the
    <= 2^d touching window per coarser source level."""
    d = dimensions
    cells = morton.deinterleave(
        prefixes[jnp.clip(rows, 0).astype(jnp.int64)], d)
    anc = _ancestors(rows, parents, lt)
    row_hi = row_boxes.astype(jnp.int64)[:, None] << np.int64(32)
    out = []

    def emit(cand, extra_valid=True):
        valid = (cand >= 0) & ((cand & SRC_BIT) != 0) & extra_valid
        out.append(jnp.where(
            valid, row_hi | (cand & ID_MASK).astype(jnp.int64),
            _INVALID_KEY))

    if src_levels is None or src_levels[lt]:
        emit(ntable[anc[0]])                # (B, m): all touch the box
    # coarser source levels: per window combo the valid candidates
    # across levels form an ancestor chain (they all contain the point
    # just outside the box's corner), so at most one carries SRC_BIT —
    # max-reduce the levels into ONE <= 2^d lane block
    best = None
    for ls in range(lt - 1, -1, -1):
        if src_levels is not None and not src_levels[ls]:
            continue
        delta, dvalid = _cross_window(cells, lt - ls, d)
        cand = _window_lookup(ntable, anc[lt - ls], delta, d)
        valid = dvalid & (cand >= 0) & ((cand & SRC_BIT) != 0)
        masked = jnp.where(valid, cand & ID_MASK, -1)
        best = masked if best is None else jnp.maximum(best, masked)
    if best is not None:
        out.append(jnp.where(
            best >= 0, row_hi | best.astype(jnp.int64), _INVALID_KEY))
    if not out:
        return jnp.full((rows.shape[0], 1), _INVALID_KEY, jnp.int64)
    return jnp.concatenate(out, axis=1)


def fgen_list1_source_side(rows, src_ids, ntable, parents, box_flags,
                           prefixes, *, ls, dimensions, tgt_levels=None):
    """Keys for target boxes at levels strictly coarser than ls (the
    <= 2^d touching window per coarser level)."""
    d = dimensions
    emitter_is_src = (box_flags[jnp.clip(rows, 0).astype(jnp.int64)]
                      & _F.IS_SOURCE_BOX) != 0
    cells = morton.deinterleave(
        prefixes[jnp.clip(rows, 0).astype(jnp.int64)], d)
    anc = _ancestors(rows, parents, ls)
    src_lo = src_ids.astype(jnp.int64)[:, None]
    # per combo at most one coarser target leaf across levels (ancestor
    # chain, see fgen_list1_target_side) — reduce to one lane block
    best = None
    for lt in range(ls - 1, -1, -1):
        if tgt_levels is not None and not tgt_levels[lt]:
            continue
        delta, dvalid = _cross_window(cells, ls - lt, d)
        cand = _window_lookup(ntable, anc[ls - lt], delta, d)
        valid = dvalid & (cand >= 0) & ((cand & TGT_BIT) != 0)
        masked = jnp.where(valid, cand & ID_MASK, -1)
        best = masked if best is None else jnp.maximum(best, masked)
    if best is None:
        return jnp.full((rows.shape[0], 1), _INVALID_KEY, jnp.int64)
    return jnp.where(
        (best >= 0) & emitter_is_src[:, None],
        (best.astype(jnp.int64) << np.int64(32)) | src_lo,
        _INVALID_KEY)


def fgen_list3(rows, w_ids, ntable, parents, box_flags, prefixes, *, ls,
               dimensions, tgt_levels=None):
    """Keys (tgt_box<<32|w) for List 3 at source level ls: coarser target
    boxes touching parent(w) but not w — the parent's full neighbor row
    at level ls-1, plus the parent's <= 2^d touching window per coarser
    level."""
    d = dimensions
    offs = jnp.asarray(_offsets1(d).T)
    w_has_src = (box_flags[jnp.clip(rows, 0).astype(jnp.int64)]
                 & (_F.IS_SOURCE_BOX | _F.HAS_SOURCE_CHILD_BOXES)) != 0
    cells = morton.deinterleave(
        prefixes[jnp.clip(rows, 0).astype(jnp.int64)], d)
    par = parents[jnp.clip(rows, 0).astype(jnp.int64)].astype(jnp.int64)
    anc = _ancestors(par.astype(jnp.int32), parents, max(0, ls - 2))
    pcells = cells >> np.int64(1)
    w_lo = w_ids.astype(jnp.int64)[:, None]
    out = []

    def valid_of(cand, delta, lt, extra_valid=True):
        # delta here is relative to w's level-lt ancestor, which equals
        # parent(w)'s level-lt ancestor for lt <= ls - 1, so the touch
        # test against w can use w's own low bits
        low_w = _low_bits(cells, ls - lt)
        not_touch_w = ~_touch_off(delta, lt, low_w[:, :, None], ls)
        return ((cand >= 0) & ((cand & TGT_BIT) != 0) & not_touch_w
                & extra_valid)

    if ls >= 1 and (tgt_levels is None or tgt_levels[ls - 1]):
        cand = ntable[anc[0]]
        out.append(jnp.where(
            valid_of(cand, offs[:, None, :], ls - 1) & w_has_src[:, None],
            ((cand & ID_MASK).astype(jnp.int64) << np.int64(32)) | w_lo,
            _INVALID_KEY))
    # coarser target levels: per combo at most one target leaf across
    # levels (ancestor chain, see fgen_list1_target_side) — max-reduce
    best = None
    for lt in range(ls - 2, -1, -1):
        if tgt_levels is not None and not tgt_levels[lt]:
            continue
        delta, dvalid = _cross_window(pcells, ls - 1 - lt, d)
        cand = _window_lookup(ntable, anc[ls - 1 - lt], delta, d)
        masked = jnp.where(valid_of(cand, delta, lt, dvalid),
                           cand & ID_MASK, -1)
        best = masked if best is None else jnp.maximum(best, masked)
    if best is not None:
        out.append(jnp.where(
            (best >= 0) & w_has_src[:, None],
            (best.astype(jnp.int64) << np.int64(32)) | w_lo,
            _INVALID_KEY))
    if not out:
        return jnp.full((rows.shape[0], 1), _INVALID_KEY, jnp.int64)
    return jnp.concatenate(out, axis=1)

# }}}
