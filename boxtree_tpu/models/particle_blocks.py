"""Dense per-box particle blocks and CSR edge helpers for FMM wranglers.

Expansion wranglers need three dense views of the (ragged) per-box
particle lists:

- ``ParticleBlocks``: every box's nonchild particles padded to a common
  width ``pmax`` (bounded by the tree's ``max_leaf_refine_weight``), so
  P2P/M2P/P2L become batched fixed-shape kernels — MXU/VPU-friendly
  instead of the reference's per-box variable-length Fortran calls
  (``boxtree/pyfmmlib_integration.py:677-1144``).
- CSR edge row indices (one row id per interaction-list entry).
- a per-level execution plan for M2L batched by translation class.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@partial(jax.jit, static_argnames=("nboxes", "pmax"))
def _build_blocks(coords, box_of_particle, box_starts, *, nboxes, pmax):
    n = coords.shape[1]
    d = coords.shape[0]
    off = jnp.arange(n, dtype=jnp.int64) \
        - box_starts.astype(jnp.int64)[box_of_particle]
    # particles beyond their box's nonchild range can't occur: nonchild
    # ranges tile the particle array exactly.
    pts = jnp.zeros((nboxes, pmax, d), coords.dtype)
    pts = pts.at[box_of_particle, off].set(coords.T, mode="drop")
    mask = jnp.zeros((nboxes, pmax), bool)
    mask = mask.at[box_of_particle, off].set(True, mode="drop")
    idx = jnp.zeros((nboxes, pmax), jnp.int32)
    idx = idx.at[box_of_particle, off].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return pts, mask, idx


class ParticleBlocks:
    """Padded (nboxes, pmax, dim) view of each box's nonchild particles.

    .. attribute:: points  (nboxes, pmax, dim)
    .. attribute:: mask    (nboxes, pmax) validity
    .. attribute:: index   (nboxes, pmax) tree-order particle index
    """

    def __init__(self, tree, which):
        coords = getattr(tree, which + "s")
        box_of = getattr(tree, f"box_id_of_{which}")
        starts = getattr(tree, f"box_{which}_starts")
        counts = getattr(tree, f"box_{which}_counts_nonchild")
        self.pmax = max(1, int(jnp.max(counts)))
        self.n = coords.shape[1]
        self.points, self.mask, self.index = _build_blocks(
            coords, box_of, starts, nboxes=tree.nboxes, pmax=self.pmax)

    def gather_values(self, particle_values):
        """(nboxes, pmax) block view of a per-particle array (0 where
        padded)."""
        vals = particle_values[jnp.clip(self.index, 0, self.n - 1)]
        return jnp.where(self.mask, vals, 0)

    def scatter_add(self, out, block_values):
        """Add (nboxes, pmax) block values back to a per-particle array."""
        safe_idx = jnp.where(self.mask, self.index, out.shape[0])
        return out.at[safe_idx].add(
            jnp.where(self.mask, block_values, 0), mode="drop")


def csr_rows(starts, nedges):
    """Row index of every edge in a CSR list (jit-safe).

    Implemented as start-marks + one cumsum: device ``searchsorted``
    costs ~550 ns/query on the target TPU (doc/PERF.md r5) — at the
    M2L plan's edge counts that is seconds of setup — while the
    scatter is row-sized and the cumsum ~5 ns/edge.  Interior starts
    equal to *nedges* (empty tail rows) drop out of bounds, matching
    the searchsorted semantics."""
    if nedges == 0:
        return jnp.zeros(0, jnp.int64)
    marks = jnp.zeros(nedges, jnp.int64).at[
        starts[1:-1].astype(jnp.int64)].add(1, mode="drop")
    return jnp.cumsum(marks)


_GMM_TILE = 64


def grouped_matmul(lhs, ops, group_sizes, tile=_GMM_TILE):
    """``out[i] = lhs[i] @ ops[g(i)]`` where rows of each group are
    contiguous (MegaBlocks-style grouped GEMM).

    Implemented as a ``lax.scan`` over fixed-size row *tiles*: each tile
    belongs to exactly one group (groups are padded up to a tile
    multiple), so the body is ONE (tile, K) x (K, K) matmul with a
    single operator read per tile — MXU-batched on TPU, and a small,
    fast-compiling program everywhere.  (``jax.lax.ragged_dot`` is NOT
    used: its XLA lowering takes essentially unbounded compile time on
    CPU for K ~ 169 and crashes the tunneled-TPU compiler outright.)

    The static tile count is ``E // tile + ngroups`` (each group wastes
    at most one partial tile).
    """
    e, k = lhs.shape
    ng = ops.shape[0]
    if e == 0 or ng == 0:
        return jnp.zeros((e, ops.shape[2] if ng else k),
                         jnp.result_type(lhs.dtype, ops.dtype))
    ntiles = e // tile + ng

    gs = group_sizes.astype(jnp.int64)
    gstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int64), jnp.cumsum(gs)])    # (ng+1,)
    tpg = -(-gs // tile)                              # tiles per group
    tstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int64), jnp.cumsum(tpg)])   # (ng+1,)

    t_ids = jnp.arange(ntiles, dtype=jnp.int64)
    gid = jnp.clip(
        jnp.searchsorted(tstart, t_ids, side="right") - 1, 0, ng - 1)
    local = t_ids - tstart[gid]                       # tile # in group
    row0 = gstart[gid] + local * tile
    lanes = jnp.arange(tile, dtype=jnp.int64)
    rows = row0[:, None] + lanes[None, :]             # (ntiles, tile)
    valid = rows < gstart[gid + 1][:, None]
    tiles_lhs = jnp.where(valid[..., None],
                          lhs[jnp.clip(rows, 0, e - 1)], 0)

    def body(_, inp):
        lt, g = inp
        return None, lt @ ops[g]

    _, out_tiles = lax.scan(body, None, (tiles_lhs, gid))

    # inverse map: row r lives at tile tstart[g]+loc//tile, lane loc%tile
    r_ids = jnp.arange(e, dtype=jnp.int64)
    rg = jnp.clip(
        jnp.searchsorted(gstart, r_ids, side="right") - 1, 0, ng - 1)
    loc = r_ids - gstart[rg]
    flat = (tstart[rg] + loc // tile) * tile + loc % tile
    return out_tiles.reshape(ntiles * tile, -1)[flat]


class M2LPlan:
    """Flattened, operator-grouped M2L execution plan.

    Plays the role of ``boxtree/translation_classes.py``: every List-2
    (box, box) pair — across *all* levels — is classified by its integer
    translation vector ``cell(target) - cell(source)``, and the edges are
    sorted so each (level, class) operator's edges form one contiguous
    run.  The whole M2L stage then runs as ONE grouped matmul
    (:func:`grouped_matmul`) instead of one XLA op per (level, class).

    .. attribute:: used

        list of ``(level, class_id)`` pairs actually present; defines the
        operator-table order wranglers must build.

    .. attribute:: tgt, src

        (E,) int32 device arrays of edge target/source boxes, sorted by
        operator id.

    .. attribute:: group_sizes

        (nops,) int32 device array of edges per operator.
    """

    def __init__(self, traversal, offsets):
        """:arg offsets: (nclasses, dim) int array of allowed translation
        vectors (the List-2 window).

        Classification, edge sorting, and per-class counting all run ON
        DEVICE (one packed int64 key sort); only the tiny per-(level,
        class) histogram crosses to the host.  The tunneled-TPU setup
        this replaces pulled every CSR array to the host (~50 MB, minutes
        through the tunnel) to classify with numpy.
        """
        tree = traversal.tree
        self.offsets = np.asarray(offsets)
        self.nclasses = len(self.offsets)
        d = tree.dimensions
        nlevels = tree.nlevels

        from boxtree_tpu.ops import morton
        self._radius = int(np.abs(self.offsets).max())
        width = 2 * self._radius + 1
        self._weights = width ** np.arange(d)
        self._table = np.full(width ** d, -1, np.int64)
        self._table[(self.offsets + self._radius) @ self._weights] = \
            np.arange(self.nclasses)
        # lazy host-side machinery for classify() (distributed runner)
        self._cells_np = None
        self._levels_np = None
        self._tree = tree

        lists = traversal.from_sep_siblings_lists
        nedges = int(lists.shape[0])
        npossible = nlevels * self.nclasses

        if nedges == 0:
            self.used = []
            self.nops = 0
            self._used_keys = np.zeros(0, np.int64)
            self.tgt = jnp.zeros(0, jnp.int32)
            self.src = jnp.zeros(0, jnp.int32)
            self.group_sizes = jnp.zeros(0, jnp.int32)
            return

        def _classify_dev(prefixes, levels, starts, lists, totp,
                          table_dev, *, nedges, npossible):
            rows = csr_rows(starts, nedges)
            tgt = totp[rows].astype(jnp.int64)
            src = lists.astype(jnp.int64)
            cells = morton.deinterleave(prefixes, d)      # (d, nboxes)
            dvec = cells[:, tgt] - cells[:, src]          # (d, E)
            # explicit multiply-add: int64 dot_general is unsupported by
            # the TPU X64 rewrite
            idx = jnp.zeros(dvec.shape[1], jnp.int64)
            for a in range(d):
                idx = idx + (dvec[a] + self._radius) * int(
                    self._weights[a])
            in_range = ((dvec + self._radius >= 0)
                        & (dvec + self._radius < width)).all(axis=0)
            cls = jnp.where(in_range,
                            table_dev[jnp.clip(idx, 0, len(
                                self._table) - 1)], -1)
            opkey = jnp.where(
                cls >= 0, levels[tgt] * self.nclasses + cls, npossible)
            # pack (opkey, edge idx) into one int64: key-only sort
            bits = max(1, int(nedges - 1).bit_length())
            packed = (opkey << bits) | jnp.arange(nedges,
                                                  dtype=jnp.int64)
            skey = jax.lax.sort(packed)
            eidx = skey & ((jnp.int64(1) << bits) - 1)
            okey = skey >> bits
            # histogram over all statically possible keys
            bounds = jnp.arange(npossible + 2, dtype=jnp.int64)
            cuts = jnp.searchsorted(okey, bounds)
            hist = cuts[1:] - cuts[:-1]                   # (npossible+1,)
            return (tgt[eidx].astype(jnp.int32),
                    src[eidx].astype(jnp.int32), hist)

        # CPU: eager (each op dispatches instantly; a jit would pay a
        # ~25 s compile per tree shape).  Accelerators: ONE jit — on the
        # tunneled TPU every *eager* op costs a separate remote compile.
        if jax.default_backend() != "cpu":
            _classify_dev = jax.jit(
                _classify_dev, static_argnames=("nedges", "npossible"))
        tgt_s, src_s, hist = _classify_dev(
            tree.box_morton_prefixes, tree.box_levels,
            traversal.from_sep_siblings_starts, lists,
            traversal.target_or_target_parent_boxes,
            jnp.asarray(self._table), nedges=nedges,
            npossible=npossible)

        hist = np.asarray(hist)                           # tiny transfer
        if hist[-1] != 0:
            raise AssertionError(
                "List-2 edge outside translation window")
        used_keys = np.nonzero(hist[:-1])[0]
        self._used_keys = used_keys.astype(np.int64)
        self.used = [(int(k) // self.nclasses, int(k) % self.nclasses)
                     for k in used_keys]
        self.nops = len(used_keys)
        self.tgt = tgt_s
        self.src = src_s
        self.group_sizes = jnp.asarray(
            hist[used_keys].astype(np.int32))

    @classmethod
    def from_used_keys(cls, tree, offsets, used_keys):
        """Edge-less plan for a known set of used ``level * nclasses +
        class`` keys (the distributed/sharded runners discover the used
        set with a device-side psum'd histogram instead of a global
        List-2 CSR).  Defines the operator-table order exactly like the
        edge-built plan; the ``tgt``/``src`` edge arrays stay empty —
        runners drive M2L through
        :meth:`~boxtree_tpu.models.expansion_base.ExpansionWranglerBase.
        multipole_to_local_edges` with their own per-rank edge slices."""
        self = cls.__new__(cls)
        self.offsets = np.asarray(offsets)
        self.nclasses = len(self.offsets)
        d = tree.dimensions
        self._radius = int(np.abs(self.offsets).max())
        width = 2 * self._radius + 1
        self._weights = width ** np.arange(d)
        self._table = np.full(width ** d, -1, np.int64)
        self._table[(self.offsets + self._radius) @ self._weights] = \
            np.arange(self.nclasses)
        self._cells_np = None
        self._levels_np = None
        self._tree = tree
        self._used_keys = np.sort(np.asarray(used_keys, np.int64))
        self.used = [(int(k) // self.nclasses, int(k) % self.nclasses)
                     for k in self._used_keys]
        self.nops = len(self._used_keys)
        self.tgt = jnp.zeros(0, jnp.int32)
        self.src = jnp.zeros(0, jnp.int32)
        self.group_sizes = jnp.zeros(self.nops, jnp.int32)
        return self

    def tiled(self, tile):
        """Tile-aligned edge arrays: each operator's edge run padded to
        a multiple of *tile* (padding edges carry target -1 and are
        dropped at the scatter), plus the per-tile operator id.

        This turns the grouped M2L matmul into a plain scan over
        fixed-size tiles with ONE operator gather per tile and no
        per-call group-boundary arithmetic — the serial tile-64
        formulation ran at <1% MXU utilization on the TPU
        (doc/PERF.md, FMM stage profile).  Cached per tile size.
        """
        cache = getattr(self, "_tiled_cache", None)
        if cache is not None and cache[0] == tile:
            return cache[1:]
        gs = np.asarray(self.group_sizes).astype(np.int64)
        e = int(gs.sum())
        gpad = (-gs) % tile
        epad = int((gs + gpad).sum())
        shift = np.concatenate([[0], np.cumsum(gpad)])[:-1]
        gstart = jnp.asarray(np.concatenate([[0], np.cumsum(gs)]))
        shift_d = jnp.asarray(shift)

        i = jnp.arange(e, dtype=jnp.int64)
        gid = jnp.searchsorted(gstart, i, side="right") - 1
        pos = i + shift_d[gid]
        tgt_t = jnp.full(epad, -1, jnp.int32).at[pos].set(
            self.tgt, unique_indices=True)
        src_t = jnp.zeros(epad, jnp.int32).at[pos].set(
            self.src, unique_indices=True)
        tile_gid = jnp.asarray(np.repeat(
            np.arange(len(gs), dtype=np.int32),
            ((gs + gpad) // tile).astype(np.int64)))
        self._tiled_cache = (tile, tgt_t, src_t, tile_gid)
        return tgt_t, src_t, tile_gid

    def class_dense(self):
        """Class-dense M2L maps: ``cmap[box, c]`` = the source box that
        interacts with *box* through translation class ``c`` (-1 if
        none), plus ``level_opid[level, c]`` = index into the operator
        table for (level, c) (-1 if unused).

        Powers the scatter-free M2L formulation: per level the targets
        are a CONTIGUOUS box-id range, so the stage becomes chunked
        ``(rows, C*K) @ (C*K, K)`` matmuls with pure contiguous writes.
        Memory: nboxes * nclasses int32.  Cached.
        """
        if getattr(self, "_class_dense_cache", None) is not None:
            return self._class_dense_cache
        tree = self._tree
        nboxes = tree.nboxes
        e = int(self.tgt.shape[0])
        gs = np.asarray(self.group_sizes).astype(np.int64)
        gstart = jnp.asarray(np.concatenate([[0], np.cumsum(gs)]))
        used_cls = jnp.asarray(self._used_keys % self.nclasses)

        i = jnp.arange(e, dtype=jnp.int64)
        gid = jnp.searchsorted(gstart, i, side="right") - 1
        cls_e = used_cls[gid]
        # 1024 pad rows so chunked dynamic_slice reads never clamp
        # (row chunks must be <= 1024)
        cmap = jnp.full((nboxes + 1024, self.nclasses), -1, jnp.int32)
        cmap = cmap.at[self.tgt.astype(jnp.int64), cls_e].set(
            self.src, unique_indices=True)

        level_opid = np.full((tree.nlevels, self.nclasses), -1,
                             np.int32)
        for i_op, key in enumerate(self._used_keys):
            level_opid[int(key) // self.nclasses,
                       int(key) % self.nclasses] = i_op
        self._class_dense_cache = (cmap, level_opid)
        return self._class_dense_cache

    def _opkey(self, tgt, src):
        if self._cells_np is None:
            from boxtree_tpu.ops import morton
            self._cells_np = np.asarray(morton.deinterleave(
                self._tree.box_morton_prefixes, self._tree.dimensions))
            self._levels_np = np.asarray(self._tree.box_levels)
        dvec = (self._cells_np[:, tgt] - self._cells_np[:, src]).T
        cls = self._table[(dvec + self._radius) @ self._weights]
        assert (cls >= 0).all(), "List-2 edge outside translation window"
        return self._levels_np[tgt].astype(np.int64) * self.nclasses \
            + cls

    def classify(self, tgt, src):
        """Operator ids (indices into :attr:`used`) for host edge arrays;
        every edge must use an operator present in the global plan."""
        opkey = self._opkey(np.asarray(tgt), np.asarray(src))
        opid = np.searchsorted(self._used_keys, opkey)
        ok = (opid < self.nops) & (self._used_keys[
            np.clip(opid, 0, self.nops - 1)] == opkey)
        assert ok.all(), "edge uses an operator absent from the plan"
        return opid
