"""Per-box neighbor tables and gather-based interaction-list generators.

The generic traversal generators locate candidate boxes with binary
searches into per-level Morton tables — O(log nboxes) serial gather
rounds per candidate, which dominates traversal time on TPU (gathers are
the scarce resource).  For the default ``well_sep_is_n_away == 1`` these
are replaced by the classic *neighbor table*, built top-down with two
gathers per entry via the parent's table::

    parent_of(cell + delta) = parent_cell + ((cell & 1) + delta) >> 1
    table[b, j] = child(table[parent(b), col], digit(cell + delta))

**Clamped entries (round 4).**  ``table[b, j]`` is the DEEPEST EXISTING
box containing cell ``cell(b) + delta_j`` at ``b``'s level: the
same-level neighbor when it exists, otherwise the finest coarser box
covering that cell (-1 only outside the domain).  Any coarser
non-ancestor box touching ``b`` must contain one of ``b``'s 3^d - 1
neighbor cells, so ONE row gather of ``b``'s own (or its parent's)
table row enumerates every cross-level candidate of Lists 1, 3 and 4 —
replacing the per-coarser-level ancestor windows (7 extra row gathers
per row at 8 levels) of the round-3 design.  A coarser box covering
several neighbor cells appears in several lanes; the *canonical-lane*
filter (:func:`_canonical_mask`, pure shift arithmetic) keeps exactly
one.

The table entries additionally pack the two predicate bits every list
needs — IS_SOURCE_BOX and "is a target-list row" — into spare high bits
of the int32 id (bits 29/30; box ids are < 2^29).  This makes candidate
filtering *zero extra gathers*: the per-candidate ``box_flags[cand]`` /
``tgt_row_of_box[cand]`` random gathers of the naive formulation (the
round-1 bottleneck, doc/PERF.md) disappear, and edge keys are emitted in
box-id space (``tgt_box << 32 | src``) so no row translation is needed
until the final CSR starts computation.  A clamped entry's LEVEL is
recovered with nlevels static compares against the level starts
(:func:`_id_level`) — no memory access.
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


@partial(jax.jit, static_argnames=("dimensions", "lsb", "radius"))
def build_neighbor_table(prefixes, parents, child_ids, box_flags,
                         tgt_box_mask, *, dimensions, lsb, radius=1):
    """(nboxes, (2r+1)^d) CLAMPED neighbor entries: ``table[b, j]`` is
    the deepest existing box containing ``cell(b) + delta_j`` (the
    same-level neighbor when it exists, else the finest covering
    coarser box; -1 outside the domain).  Column order matches
    ``_offsets(d, radius)``, center column = self.  Entries pack the
    candidate-filter bits (see module doc).

    Built PARENT-side: level lev-1 is a contiguous slice of the table
    (no gather at all to read it), the children of all neighbor
    entries arrive in ONE row-gather per parent, and the
    (child digit, column) -> (parent column, child digit) index maps are
    fully static, so each level costs ~(2r+1)^d/2^d gather lanes per box
    instead of the 2*(2r+1)^d scattered lanes of the child-side build.
    Clamping falls out of the recurrence: where the parent-level entry
    is coarser (already clamped) or its child at the needed digit is
    absent, the parent-level entry itself propagates down.

    ``radius = n`` serves ``well_sep_is_n_away = n`` (r4): the
    recurrence stays closed for any n because a child offset delta in
    [-n, n] needs parent offsets ``(q + delta) >> 1`` within
    [-ceil(n/2), ceil((n+1)/2)], all inside radius n.
    """
    d = dimensions
    from boxtree_tpu.traversal.build import _offsets
    offs = _offsets(d, radius)               # (m, d) numpy
    m = offs.shape[0]
    nchild = 2 ** d
    nboxes = lsb[-1]
    nlevels = len(lsb) - 1
    width = 2 * radius + 1
    col_w = width ** (d - 1 - np.arange(d))  # column weights (axis 0 slowest)

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
            pcol[q, j] = ((dp + radius) * col_w).sum()
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
        # child lookups are meaningful only where the parent-level entry
        # is actually AT the parent level (an already-clamped coarser
        # entry's children cover different cells)
        at_plev = (pn >= 0) & (pid >= np.int64(lsb[lev - 1]))
        ch = jnp.where(at_plev[:, :, None], ch, np.int32(-1))
        # (P, 2^d, m) candidate table rows for every potential child;
        # absent child -> the parent-level entry itself (clamping)
        eq = []
        for q in range(nchild):
            eq.append(jnp.stack(
                [jnp.where(ch[:, int(pcol[q, j]), int(cdig[q, j])] >= 0,
                           ch[:, int(pcol[q, j]), int(cdig[q, j])],
                           pn[:, int(pcol[q, j])])
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


# {{{ clamped-row helpers

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


def _id_level(ids, lsb):
    """Level of each box id (valid where ``ids >= 0``): ids are
    level-major, so the level is the number of level starts <= id —
    nlevels static compares, no memory access."""
    lev = jnp.zeros(ids.shape, jnp.int32)
    for b in lsb[1:-1]:
        lev = lev + (ids >= np.int32(b))
    return lev


def _canonical_mask(cells, lev_e, row_level, dimensions):
    """Keep each clamped coarser entry in exactly ONE lane.

    A coarser leaf touching the row box covers several of its 3^d
    neighbor cells and therefore appears in several lanes; its canonical
    lane has, per axis, offset 0 where the entry's cell range covers the
    row cell's coordinate and the strict sign offset where it does not.
    Lane offset ``o`` is canonical iff per axis ``o == 0`` or the cell
    ``c + o`` falls outside the row cell's level-``s`` block
    (``(c + o) >> s != c >> s``), with ``s = row_level - level(entry)``.

    :arg cells: (d, B) row-box cells at ``row_level``.
    :arg lev_e: (B, m) entry levels.
    :returns: (B, m) bool, True on canonical lanes (same-level entries,
        ``s == 0``, are always canonical — each covers one cell).
    """
    d = dimensions
    offs = _offsets1(d)                                  # (m, d)
    s = (np.int64(row_level) - lev_e.astype(jnp.int64))  # (B, m)
    s = jnp.clip(s, 0)
    ok = jnp.ones(lev_e.shape, bool)
    for a in range(d):
        o = jnp.asarray(offs[:, a])[None, :]             # (1, m)
        c = cells[a][:, None]                            # (B, 1)
        outside = ((c + o) >> s) != (c >> s)
        ok = ok & ((o == 0) | outside)
    return ok


def _not_touching(cells_f, level_f, anchor_cells, anchor_level, lev_e,
                  dimensions):
    """True where the lane's entry does NOT touch the fine box.

    The entry at lane offset ``o`` (static) covers the anchor's neighbor
    cell ``anchor_cells + o``; its own cell is that, shifted coarser by
    ``anchor_level - level(entry)``.  Touching the fine box at
    ``(cells_f, level_f)`` is the closed-box adjacency test in exact
    integer arithmetic (cf. :func:`_touch_off`), with per-lane dynamic
    shifts since clamped entry levels vary."""
    d = dimensions
    offs = _offsets1(d)                                  # (m, d)
    s_anc = (np.int64(anchor_level)
             - lev_e.astype(jnp.int64))                  # (B, m) >= 0
    s_anc = jnp.clip(s_anc, 0)
    t = s_anc + np.int64(level_f - anchor_level)         # level_f - lev_e
    touch = jnp.ones(lev_e.shape, bool)
    for a in range(d):
        o = jnp.asarray(offs[:, a])[None, :]             # (1, m)
        q = (anchor_cells[a][:, None] + o) >> s_anc      # entry cell
        lo = q << t
        hi = (q + 1) << t
        cf = cells_f[a][:, None]
        touch = touch & (lo <= cf + 1) & (cf <= hi)
    return ~touch

# }}}


# {{{ fast generators (rows are box-id chunks at one static level)

def fgen_slnws(rows, ntable, *, lsb_lev, dimensions):
    """Colleagues = same-level entries of the clamped neighbor-table row
    without the center column (clamped coarser entries are filtered by
    the one ``id >= lsb[lev]`` compare — row entries are never deeper).
    Works at any table radius: radius n rows give exactly the
    ``well_sep_is_n_away = n`` colleague window."""
    m = ntable.shape[1]
    t = ntable[jnp.clip(rows, 0).astype(jnp.int64)]
    keep = np.arange(m) != m // 2
    t = t[:, keep]
    ids = t & ID_MASK
    return jnp.where((t >= 0) & (ids >= np.int32(lsb_lev)), ids, -1)


def touch_columns(dimensions, radius):
    """Static indices of the |delta|_inf <= 1 columns within a
    radius-*radius* table row, in ``_offsets(d, 1)`` order (the raster
    layouts nest, so filtering preserves relative order)."""
    from boxtree_tpu.traversal.build import _offsets
    offs = _offsets(dimensions, radius)
    return np.flatnonzero((np.abs(offs) <= 1).all(axis=1))


def _list2_valid_pairs(dimensions, n_away=1):
    """For each child digit r: the static list of (neighbor column j,
    child digit q) whose candidate is well-separated from r — i.e. the
    List-2 window, enumerated once per *parent*.  Columns index the
    radius-``n_away`` table layout."""
    d = dimensions
    from boxtree_tpu.traversal.build import _offsets
    offs = _offsets(d, n_away)
    nchild = 2 ** d

    def bits(q):
        return np.array([(q >> (d - 1 - a)) & 1 for a in range(d)])

    pairs = []
    for r in range(nchild):
        lst = []
        for j in range(len(offs)):
            for q in range(nchild):
                off = 2 * offs[j] + bits(q) - bits(r)
                if (np.abs(off) > n_away).any():
                    lst.append((j, q))
        pairs.append(lst)
    return pairs


def fgen_list2_parent(prows, ntable, child_rows, *, dimensions,
                      min_id=0, n_away=1):
    """List-2 candidates enumerated from the PARENT level: one
    neighbor-table row plus (2n+1)^d child-row gathers per parent serve
    all 2^d children (the per-(column, digit) well-separation test is
    fully static).  Returns ``(cand, own)`` with ``cand`` (B, 2^d, K)
    candidate box ids (-1 invalid) and ``own`` (B, 2^d) the child boxes
    owning each candidate row (0 = absent child).

    :arg min_id: first box id of the parent level — filters clamped
        coarser entries out of the parent row (their children cover the
        wrong cells)."""
    rows_i = jnp.clip(prows, 0).astype(jnp.int64)
    return list2_from_parent_rows(ntable[rows_i], child_rows[rows_i],
                                  child_rows, dimensions=dimensions,
                                  min_id=min_id, n_away=n_away)


def list2_from_parent_rows(pn, own, child_rows, *, dimensions, min_id=0,
                           n_away=1):
    """Core of :func:`fgen_list2_parent` over already-gathered parent
    neighbor rows ``pn`` (B, (2n+1)^d) and child entries ``own``
    (B, 2^d) — also the sharded-traversal entry point, where each
    device holds its OWNED neighbor-table rows directly
    (:func:`boxtree_tpu.parallel.shard_build.sharded_l2_edges`; its
    per-rank table keeps -1 for absent neighbors, so it passes the
    default ``min_id=0``)."""
    d = dimensions
    m = (2 * n_away + 1) ** d
    nchild = 2 ** d

    # ONE (B, m, 2^d) child gather + ONE static-index lane gather
    # (stacking the (j, q) lanes individually explodes the op count —
    # 7000 concats at n_away=2, measured 36 s/2e6 + 10-min compiles)
    pid = (jnp.clip(pn, 0) & ID_MASK).astype(jnp.int64)  # (B, m)
    min_id_a = jnp.asarray(min_id, jnp.int64)
    if min_id_a.ndim == 1:                  # per-row (sharded caller)
        min_id_a = min_id_a[:, None]
    ok = (pn >= 0) & (pid >= min_id_a)
    ch = child_rows[pid]                                 # (B, m, 2^d)
    cand_all = jnp.where(
        ok[..., None] & (ch > 0), ch, -1).reshape(pn.shape[0],
                                                  m * nchild)
    pairs = _list2_valid_pairs(d, n_away)
    pair_idx = np.asarray(
        [[j * nchild + q for (j, q) in pairs[r]]
         for r in range(nchild)])                        # (2^d, K)
    cand = cand_all[:, pair_idx]                         # (B, 2^d, K)
    return jnp.where(own[..., None] > 0, cand, -1), own


def fgen_list2(rows, ntable, child_rows, parents, prefixes, *, dimensions,
               min_id=0, n_away=1):
    """Children of parent's neighbors that are >n away: candidate cell
    offsets are fully static per (neighbor column, child digit); each
    neighbor's children come from ONE row gather of the transposed
    child table instead of 2^d scalar gathers.  *min_id* (first box id
    of the parent level) filters clamped coarser parent-row entries."""
    d = dimensions
    from boxtree_tpu.traversal.build import _offsets
    offs = _offsets(d, n_away)
    m = len(offs)
    nchild = 2 ** d
    rows_i = jnp.clip(rows, 0).astype(jnp.int64)
    pn = ntable[parents[rows_i].astype(jnp.int64)]          # (B, m)
    own_digit = (prefixes[rows_i] & (nchild - 1)).astype(jnp.int64)
    r_bits = jnp.stack([(own_digit >> (d - 1 - a)) & 1
                        for a in range(d)])                 # (d, B)
    out = []
    for j in range(m):
        pnj = pn[:, j]
        pid = jnp.clip(pnj, 0) & ID_MASK
        ch = child_rows[pid]                         # (B, nchild)
        ok = (pnj >= 0) & (pid >= np.int32(min_id))
        for q in range(nchild):
            cand = ch[:, q]
            q_bits = np.array([(q >> (d - 1 - a)) & 1 for a in range(d)])
            off = (2 * offs[j] + q_bits)[:, None] - r_bits  # (d, B)
            wellsep = (jnp.abs(off) > n_away).any(axis=0)
            valid = ok & (cand > 0) & wellsep
            out.append(jnp.where(valid, cand, -1))
    return jnp.stack(out, axis=1)


def fgen_list4(rows, ntable, parents, prefixes, *, lb,
               dimensions, lsb):
    """List 4 at target level lb: coarser source leaves touching the
    parent of each row box but not the box itself.  With clamped table
    rows this is ONE gather of the PARENT's 3^d row: any coarser
    non-ancestor box touching the parent covers one of its neighbor
    cells, ancestors self-filter (internal boxes carry no SRC_BIT), the
    canonical-lane mask dedupes multi-cell coverage, and the
    not-touching-the-row-box test is per-lane shift arithmetic
    (replaces the per-ancestor-level windows of the round-3 design:
    ~8 row gathers -> 1)."""
    d = dimensions
    rows_i = jnp.clip(rows, 0).astype(jnp.int64)
    cells = morton.deinterleave(prefixes[rows_i], d)        # (d, B)
    pcells = cells >> np.int64(1)
    par = parents[rows_i].astype(jnp.int64)
    t = ntable[par]                                         # (B, m)
    ids = jnp.clip(t, 0) & ID_MASK
    lev = _id_level(ids, lsb)                               # (B, m)
    valid = (t >= 0) & ((t & SRC_BIT) != 0)
    valid = valid & _canonical_mask(pcells, lev, lb - 1, d)
    valid = valid & _not_touching(cells, lb, pcells, lb - 1, lev, d)
    return jnp.where(valid, ids, -1)


def fgen_list1_tgt(rows, ntable, prefixes, *, lt, dimensions, lsb,
                   touch_cols=None):
    """Target-side List-1 keys ``(b << 32) | src`` from ONE clamped row
    gather per leaf box: source leaves touching b at b's level or
    coarser = the row's SRC_BIT entries (same-level entries always
    touch; coarser entries touch by the clamp invariant; the
    canonical-lane mask dedupes multi-cell coverage).

    Rows are enumerated ascending across the whole plan, so the emitted
    keys are ALREADY in global CSR order — the target side needs no
    post-sort at all (its per-row counts fall out of the emission
    scan).  Deeper-source edges of a coarse target come from
    :func:`fgen_list1_src`."""
    d = dimensions
    rows_i = jnp.clip(rows, 0).astype(jnp.int64)
    t = ntable[rows_i]                                      # (B, m)
    if touch_cols is not None:      # radius-n table: |delta| <= 1 cols
        t = t[:, np.asarray(touch_cols)]
    ids = jnp.clip(t, 0) & ID_MASK
    lev = _id_level(ids, lsb)
    row_is_tgt = (t[:, 3 ** d // 2] & TGT_BIT) != 0
    # canonical dedupe applies to coarser entries only (same-level
    # entries each cover exactly one cell; the mask is trivially True
    # there, so one combined mask serves both)
    cells = morton.deinterleave(prefixes[rows_i], d)        # (d, B)
    canon = _canonical_mask(cells, lev, lt, d)
    return jnp.where(
        (t >= 0) & ((t & SRC_BIT) != 0) & canon & row_is_tgt[:, None],
        ids, -1)


def fgen_list1_both(rows, row_boxes, ntable, prefixes, *, lt,
                    dimensions, lsb, touch_cols=None):
    """Both List-1 sides from ONE clamped row gather (used when target
    rows == participant rows, i.e. ``sources_are_targets``): returns
    ``(cand_t, keys_s)`` — the target-side candidate ids (B, 3^d) for
    the CSR-ordered emission of :func:`fgen_list1_tgt`, and the
    source-side ``(tgt << 32) | b`` keys of :func:`fgen_list1_src`."""
    d = dimensions
    rows_i = jnp.clip(rows, 0).astype(jnp.int64)
    t = ntable[rows_i]                                      # (B, m)
    if touch_cols is not None:      # radius-n table: |delta| <= 1 cols
        t = t[:, np.asarray(touch_cols)]
    ids = jnp.clip(t, 0) & ID_MASK
    lev = _id_level(ids, lsb)
    same = ids >= np.int32(lsb[lt])
    center = t[:, 3 ** d // 2]
    cells = morton.deinterleave(prefixes[rows_i], d)        # (d, B)
    canon = _canonical_mask(cells, lev, lt, d)
    valid = (t >= 0) & canon
    cand_t = jnp.where(
        valid & ((t & SRC_BIT) != 0)
        & ((center & TGT_BIT) != 0)[:, None],
        ids, -1)
    keys_s = jnp.where(
        valid & ((t & TGT_BIT) != 0) & ~same
        & ((center & SRC_BIT) != 0)[:, None],
        (ids.astype(jnp.int64) << np.int64(32))
        | row_boxes.astype(jnp.int64)[:, None], _INVALID_KEY)
    return cand_t, keys_s


def fgen_list1_src(rows, row_boxes, ntable, prefixes, *, lt,
                   dimensions, lsb, touch_cols=None):
    """Source-side List-1 keys ``(tgt << 32) | b``: coarser target
    leaves touching source leaf b = the coarser TGT_BIT entries of b's
    clamped row.  These cross-level edges are RARE (they exist only
    along coarse-fine leaf boundaries) and land in other boxes' CSR
    rows, so they are emitted into their own small compacted buffer and
    merged with the target side by one real-edges-only sort — skipped
    entirely when this side is empty (e.g. uniform trees)."""
    d = dimensions
    rows_i = jnp.clip(rows, 0).astype(jnp.int64)
    t = ntable[rows_i]                                      # (B, m)
    if touch_cols is not None:      # radius-n table: |delta| <= 1 cols
        t = t[:, np.asarray(touch_cols)]
    ids = jnp.clip(t, 0) & ID_MASK
    lev = _id_level(ids, lsb)
    same = ids >= np.int32(lsb[lt])
    row_is_src = (t[:, 3 ** d // 2] & SRC_BIT) != 0
    cells = morton.deinterleave(prefixes[rows_i], d)        # (d, B)
    canon = _canonical_mask(cells, lev, lt, d)
    b64 = row_boxes.astype(jnp.int64)[:, None]
    return jnp.where(
        (t >= 0) & ((t & TGT_BIT) != 0) & ~same & canon
        & row_is_src[:, None],
        (ids.astype(jnp.int64) << np.int64(32)) | b64, _INVALID_KEY)


def fgen_list3(rows, w_ids, ntable, parents, prefixes, box_flags, *, ls,
               dimensions, lsb):
    """Keys ``(tgt_box << 32) | w`` for List 3 at source level ls:
    coarser target leaves touching parent(w) but not w — ONE clamped
    row gather of the parent (same argument as :func:`fgen_list4`)."""
    d = dimensions
    rows_i = jnp.clip(rows, 0).astype(jnp.int64)
    cells = morton.deinterleave(prefixes[rows_i], d)
    pcells = cells >> np.int64(1)
    par = parents[rows_i].astype(jnp.int64)
    t = ntable[par]                                         # (B, m)
    ids = jnp.clip(t, 0) & ID_MASK
    lev = _id_level(ids, lsb)
    valid = (t >= 0) & ((t & TGT_BIT) != 0)
    valid = valid & _canonical_mask(pcells, lev, ls - 1, d)
    valid = valid & _not_touching(cells, ls, pcells, ls - 1, lev, d)
    w_has_src = (box_flags[rows_i]
                 & (_F.IS_SOURCE_BOX | _F.HAS_SOURCE_CHILD_BOXES)) != 0
    w_lo = w_ids.astype(jnp.int64)[:, None]
    return jnp.where(
        valid & w_has_src[:, None],
        (ids.astype(jnp.int64) << np.int64(32)) | w_lo,
        _INVALID_KEY)

# }}}
