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
    Entries pack the candidate-filter bits (see module doc)."""
    d = dimensions
    offs = _offsets1(d)                      # (m, d) numpy
    m = offs.shape[0]
    nboxes = lsb[-1]
    nlevels = len(lsb) - 1
    col_w = 3 ** (d - 1 - np.arange(d))      # column weights (axis 0 slowest)

    # per-box PACKED entries (id | predicate bits); packing during
    # construction lets the per-level child lookup resolve entry AND
    # flags in a single scattered gather (gathers are the scarce TPU
    # resource — this build is one row-gather + one scattered gather
    # per level instead of 2 scattered gathers per table column)
    iota = jnp.arange(nboxes, dtype=jnp.int32)
    ent = (iota
           | jnp.where((box_flags & _F.IS_SOURCE_BOX) != 0, SRC_BIT, 0)
           | jnp.where(tgt_box_mask, TGT_BIT, 0)).astype(jnp.int32)
    # child_entry[digit, parent] -> packed entry of that child (-1 absent)
    child_ent = jnp.where(
        child_ids > 0,
        ent[jnp.clip(child_ids, 0).astype(jnp.int64)],
        np.int32(-1)).reshape(-1)            # ((2^d) * nboxes,)

    table = jnp.full((nboxes, m), -1, jnp.int32)
    table = table.at[0, m // 2].set(ent[0])

    for lev in range(1, nlevels):
        b0, b1 = lsb[lev], lsb[lev + 1]
        ids = jnp.arange(b0, b1, dtype=jnp.int64)
        cells = morton.deinterleave(prefixes[b0:b1], d)    # (d, nl)
        par = parents[ids]
        parity = (cells & 1).astype(jnp.int64)             # (d, nl)
        cols = []
        for j in range(m):
            delta = offs[j]                                # (d,)
            dp = (parity + delta[:, None]) >> 1            # (d, nl)
            col = jnp.zeros(ids.shape, jnp.int64)
            digit = jnp.zeros(ids.shape, jnp.int64)
            for a in range(d):
                col = col + (dp[a] + 1) * int(col_w[a])
                digit = digit + (((cells[a] + delta[a]) & 1)
                                 << (d - 1 - a))
            pn = table[par, col]
            pid = (jnp.clip(pn, 0) & ID_MASK).astype(jnp.int64)
            cand = child_ent[digit * np.int64(nboxes) + pid]
            cols.append(jnp.where(pn >= 0, cand, np.int32(-1)))
        table = table.at[b0:b1].set(jnp.stack(cols, axis=1))

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
    d = dimensions
    m = 3 ** d
    nchild = 2 ** d
    rows_i = jnp.clip(prows, 0).astype(jnp.int64)
    pn = ntable[rows_i]                                 # (B, m)
    own = child_rows[rows_i]                            # (B, nchild)

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


def fgen_list4(rows, ntable, parents, prefixes, *, lb,
               dimensions, k_pad, src_levels=None):
    """List 4 at target level lb: non-center neighbors of each strict
    ancestor (levels lb-1 .. 1) that are source boxes, not touching the
    row box, but touching its parent."""
    d = dimensions
    m = 3 ** d
    offs = jnp.asarray(_offsets1(d).T)                      # (d, m)
    keep = np.arange(m) != m // 2
    cells = morton.deinterleave(
        prefixes[jnp.clip(rows, 0).astype(jnp.int64)], d)
    anc = _ancestors(rows, parents, lb)
    chunks = []
    for wl in range(lb - 1, 0, -1):
        if src_levels is not None and not src_levels[wl]:
            continue
        a = anc[lb - wl]
        cand = ntable[a][:, keep]                           # (B, m-1)
        is_src = (cand & SRC_BIT) != 0
        # candidate cell = (own cell >> (lb-wl)) + delta
        low_b = _low_bits(cells, lb - wl)                   # vs own box
        off = offs[:, None, :][:, :, keep]                  # (d, 1, m-1)
        not_touch_b = ~_touch_off(off, wl, low_b[:, :, None], lb)
        # vs parent (level lb-1): parent cell low bits rel. ancestor at wl
        low_p = _low_bits(cells >> np.int64(1), lb - 1 - wl)
        enters = _touch_off(off, wl, low_p[:, :, None], lb - 1)
        valid = (cand >= 0) & is_src & not_touch_b & enters
        chunks.append(jnp.where(valid, cand & ID_MASK, -1))
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
    each target box: the full neighbor-table rows of the ancestor
    chain."""
    d = dimensions
    offs = jnp.asarray(_offsets1(d).T)                      # (d, m)
    cells = morton.deinterleave(
        prefixes[jnp.clip(rows, 0).astype(jnp.int64)], d)
    anc = _ancestors(rows, parents, lt)
    out = []
    for ls in range(lt, -1, -1):
        if src_levels is not None and not src_levels[ls]:
            continue
        cand = ntable[anc[lt - ls]]                         # (B, m)
        is_src = (cand & SRC_BIT) != 0
        low = _low_bits(cells, lt - ls)
        touch = _touch_off(offs[:, None, :], ls, low[:, :, None], lt)
        valid = (cand >= 0) & is_src & touch
        keys = jnp.where(
            valid,
            (row_boxes.astype(jnp.int64)[:, None] << np.int64(32))
            | (cand & ID_MASK).astype(jnp.int64),
            _INVALID_KEY)
        out.append(keys)
    if not out:
        return jnp.full((rows.shape[0], 1), _INVALID_KEY, jnp.int64)
    return jnp.concatenate(out, axis=1)


def fgen_list1_source_side(rows, src_ids, ntable, parents, box_flags,
                           prefixes, *, ls, dimensions, tgt_levels=None):
    """Keys for target boxes at levels strictly coarser than ls."""
    d = dimensions
    offs = jnp.asarray(_offsets1(d).T)
    emitter_is_src = (box_flags[jnp.clip(rows, 0).astype(jnp.int64)]
                      & _F.IS_SOURCE_BOX) != 0
    cells = morton.deinterleave(
        prefixes[jnp.clip(rows, 0).astype(jnp.int64)], d)
    anc = _ancestors(rows, parents, ls)
    out = []
    for lt in range(ls - 1, -1, -1):
        if tgt_levels is not None and not tgt_levels[lt]:
            continue
        cand = ntable[anc[ls - lt]]
        is_tgt = (cand & TGT_BIT) != 0
        low = _low_bits(cells, ls - lt)
        touch = _touch_off(offs[:, None, :], lt, low[:, :, None], ls)
        valid = ((cand >= 0) & is_tgt & touch
                 & emitter_is_src[:, None])
        keys = jnp.where(
            valid,
            ((cand & ID_MASK).astype(jnp.int64) << np.int64(32))
            | src_ids.astype(jnp.int64)[:, None],
            _INVALID_KEY)
        out.append(keys)
    if not out:
        return jnp.full((rows.shape[0], 1), _INVALID_KEY, jnp.int64)
    return jnp.concatenate(out, axis=1)


def fgen_list3(rows, w_ids, ntable, parents, box_flags, prefixes, *, ls,
               dimensions, tgt_levels=None):
    """Keys (tgt_box<<32|w) for List 3 at source level ls: coarser target
    boxes in the neighbor windows of parent(w)'s ancestor chain, with
    parent(w) touching them but w itself not."""
    d = dimensions
    offs = jnp.asarray(_offsets1(d).T)
    w_has_src = (box_flags[jnp.clip(rows, 0).astype(jnp.int64)]
                 & (_F.IS_SOURCE_BOX | _F.HAS_SOURCE_CHILD_BOXES)) != 0
    cells = morton.deinterleave(
        prefixes[jnp.clip(rows, 0).astype(jnp.int64)], d)
    par = parents[jnp.clip(rows, 0).astype(jnp.int64)].astype(jnp.int64)
    anc = _ancestors(par.astype(jnp.int32), parents, ls - 1)
    pcells = cells >> np.int64(1)
    out = []
    for lt in range(ls - 1, -1, -1):
        if tgt_levels is not None and not tgt_levels[lt]:
            continue
        cand = ntable[anc[ls - 1 - lt]]                     # (B, m)
        is_tgt = (cand & TGT_BIT) != 0
        if lt < ls - 1:
            low_p = _low_bits(pcells, ls - 1 - lt)
            enters = _touch_off(offs[:, None, :], lt,
                                low_p[:, :, None], ls - 1)
        else:
            enters = jnp.ones(cand.shape, bool)
        low_w = _low_bits(cells, ls - lt)
        # candidate cell = anc_p + delta; own cell relative to anc_p:
        # anc of w at lt is the same as anc of parent at lt (lt <= ls-1)
        not_touch_w = ~_touch_off(offs[:, None, :], lt,
                                  low_w[:, :, None], ls)
        valid = ((cand >= 0) & is_tgt & enters & not_touch_w
                 & w_has_src[:, None])
        keys = jnp.where(
            valid,
            ((cand & ID_MASK).astype(jnp.int64) << np.int64(32))
            | w_ids.astype(jnp.int64)[:, None],
            _INVALID_KEY)
        out.append(keys)
    if not out:
        return jnp.full((rows.shape[0], 1), _INVALID_KEY, jnp.int64)
    return jnp.concatenate(out, axis=1)

# }}}
