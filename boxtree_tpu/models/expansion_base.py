"""Shared plumbing for expansion wranglers.

The FMM stages factor into kernel-independent machinery (this module) and
a small set of kernel hooks.  The machinery handles:

- per-box particle blocks and chunked CSR-edge evaluation (P2P/M2P/P2L
  run as fixed-shape batched kernels over edge chunks inside ``lax.scan``),
- M2M/L2L as ONE grouped matmul per level (boxes sorted by child digit,
  ``jax.lax.ragged_dot`` — no redundant per-digit matmuls),
- M2L as ONE grouped matmul over all (level, translation class) runs
  (edges pre-sorted by operator; MXU work with a tiny compile graph).

Every interaction-list stage also has an ``*_edges`` form taking flat
(target box, source box) edge arrays instead of CSR lists; the
distributed runner (:mod:`boxtree_tpu.parallel.distributed`) drives those
directly with its per-rank edge partitions, so any wrangler built on this
base distributes without extra code — the analogue of the reference's
``DistributedExpansionWranglerMixin`` (``boxtree/distributed/
calculation.py:53-416``) falling out of the edge-based design.

Subclasses provide (for a coefficient vector of length ``ncoeff``):

- ``_p2m_terms(rel, q)``: (npart, K) multipole contributions
- ``_l2p_eval(rel, loc)``: potentials from local coefficients
- ``_m2p_eval(rel, mp)``: potentials from multipole coefficients
- ``_p2l_terms(rel, q)``: (P, K) local contributions of a source block
- ``_p2p(tgt_pts, src_pts, src_valid, q)``: direct kernel evaluation
- host operator builders ``_m2m_matrix(t)``, ``_l2l_matrix(t)``,
  ``_m2l_matrix(t)`` (t: cartesian translation vector)

Reference counterpart: ``boxtree/pyfmmlib_integration.py:276-1162`` (which
instead calls level-batched Fortran routines).
"""

from __future__ import annotations

import os

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from boxtree_tpu.fmm.drive import ExpansionWranglerInterface
from boxtree_tpu.models.particle_blocks import (
    M2LPlan,
    ParticleBlocks,
    csr_rows,
    grouped_matmul,
)
from boxtree_tpu.traversal.build import _offsets

_EDGE_CHUNK = 4096


@partial(jax.jit, static_argnames=("ntb", "lmax"))
def _rowmap_from_edges(rows, srcs, *, ntb, lmax):
    """Padded (ntb, lmax) row->source-box map from flat (row, src)
    edges: one packed int64 key sort, contiguous unpack, unique
    scatter.  Unused slots hold -1."""
    key = (rows.astype(jnp.int64) << np.int64(32)) | srcs.astype(jnp.int64)
    ks = lax.sort(key)
    r = (ks >> np.int64(32)).astype(jnp.int64)
    s = (ks & np.int64(0xFFFFFFFF)).astype(jnp.int32)
    starts = jnp.searchsorted(
        r, jnp.arange(ntb, dtype=jnp.int64)).astype(jnp.int64)
    pos = (jnp.arange(r.shape[0], dtype=jnp.int64)
           - starts[jnp.clip(r, 0, ntb - 1)])
    return jnp.full((ntb, lmax), -1, jnp.int32).at[r, pos].set(
        s, mode="drop", unique_indices=True)


@partial(jax.jit, static_argnames=("ntb",))
def _merge_level_edges(tgts_by_level, starts_by_level, lists_by_level,
                       row_of_box, *, ntb):
    """Merge per-source-level CSR edge lists (rows are global target-box
    ids via *tgts_by_level*) into flat (row, src) edges over the
    target_boxes row set, plus the max and nonempty row counts (for the
    padded row map's static shape)."""
    rows_parts, src_parts = [], []
    for tgts, starts, lists in zip(
            tgts_by_level, starts_by_level, lists_by_level):
        e = int(lists.shape[0])
        rows = csr_rows(starts, e)
        rows_parts.append(
            row_of_box[tgts.astype(jnp.int64)[rows]].astype(jnp.int32))
        src_parts.append(lists.astype(jnp.int32))
    rows = jnp.concatenate(rows_parts)
    srcs = jnp.concatenate(src_parts)
    counts = jnp.zeros(ntb, jnp.int32).at[rows.astype(jnp.int64)].add(
        1, mode="drop")
    return rows, srcs, counts.max(), (counts > 0).sum()


@partial(jax.jit, static_argnames=("ntb", "nne", "lmax", "nboxes"))
def _nonempty_rowmap(rows, srcs, boxes_of_row, *, ntb, nne, lmax,
                     nboxes):
    """Compress flat (row, src) edges to a (nne, lmax) padded map over
    the NONEMPTY rows only (interaction lists 3/4 are sparse: most
    boxes have no entries, and a full-row map wastes both memory and —
    through the padded evaluation lanes — compute).  Returns the map,
    the nonempty rows' global box ids, and the (nboxes+1,)
    box -> compact-row inverse (-1 where absent)."""
    counts = jnp.zeros(ntb, jnp.int32).at[rows.astype(jnp.int64)].add(
        1, mode="drop")
    mask = counts > 0
    pos = jnp.cumsum(mask.astype(jnp.int64)) - 1
    ne_rows = jnp.zeros(nne, jnp.int64).at[
        jnp.where(mask, pos, nne)].set(
        jnp.arange(ntb, dtype=jnp.int64), mode="drop",
        unique_indices=True)
    rank = pos[rows.astype(jnp.int64)].astype(jnp.int32)
    rowmap = _rowmap_from_edges(rank, srcs, ntb=nne, lmax=lmax)
    ne_boxes = boxes_of_row[ne_rows]
    row_of_box = jnp.full(nboxes + 1, -1, jnp.int32).at[
        ne_boxes.astype(jnp.int64)].set(
        jnp.arange(nne, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    return rowmap, ne_boxes.astype(jnp.int64), row_of_box


@jax.jit
def _csr_lmax(starts):
    return (starts[1:] - starts[:-1]).max()


def _bucket_rowmap(rmap, rows, row_of_box, bt):
    """Two-tier split of a padded (ntb, lmax) row map (doc/PERF.md r4):
    rows no longer than a device-chosen threshold T — minimizing
    ``nA*T + nB*lmax`` over a candidate grid — run in their own
    narrower scan, cutting the padded evaluation lanes (~59% waste for
    List 1 at 1e6: lmax 54 vs mean 22).  The bucket permutation is
    composed into *row_of_box* (the indirection the final per-particle
    gather uses anyway), with bucket B's out rows offset by bucket A's
    bt-padded row count.

    :returns: ``(buckets, new_row_of_box, padded_lanes)`` where
        *buckets* is a tuple of ``(rmap_i, rows_i)`` and *padded_lanes*
        the total bt-padded lane count (for callers gating on waste).
    """
    ntb, lmax = (int(x) for x in rmap.shape)

    def pad(x):
        return -(-x // bt) * bt

    @jax.jit
    def pick(rmap):
        lens = (rmap >= 0).sum(axis=1).astype(jnp.int64)
        cands = jnp.asarray([4, 6, 8, 12, 16, 20, 24, 28, 32, 40, 48],
                            jnp.int64)
        na = (lens[None, :] <= cands[:, None]).sum(axis=1)
        cost = na * cands + (ntb - na) * lmax
        cost = jnp.where(cands < lmax, cost, ntb * lmax)
        best = jnp.argmin(cost)
        t_best = jnp.where(cost[best] < ntb * lmax, cands[best], lmax)
        return jnp.stack([t_best, (lens <= t_best).sum()])

    t_split, na = (int(x) for x in jax.device_get(pick(rmap)))
    if na in (0, ntb) or t_split >= lmax:
        return ((rmap, rows),), row_of_box, pad(ntb) * lmax

    @partial(jax.jit, static_argnames=("na", "t"))
    def split(rmap, rows, row_of_box, *, na, t):
        lens = (rmap >= 0).sum(axis=1)
        short = lens <= t
        pos_a = jnp.cumsum(short.astype(jnp.int64)) - 1
        pos_b = jnp.cumsum((~short).astype(jnp.int64)) - 1
        perm = jnp.zeros(ntb, jnp.int64)
        perm = perm.at[jnp.where(short, pos_a, na + pos_b)].set(
            jnp.arange(ntb, dtype=jnp.int64), unique_indices=True)
        out_pos = jnp.where(short, pos_a, pad(na) + pos_b).astype(
            jnp.int32)
        new_rob = jnp.where(
            row_of_box >= 0,
            out_pos[jnp.clip(row_of_box, 0).astype(jnp.int64)],
            row_of_box)
        return (rmap[perm[:na], :t], rows[perm[:na]],
                rmap[perm[na:]], rows[perm[na:]], new_rob)

    rmap_a, rows_a, rmap_b, rows_b, new_rob = split(
        rmap, rows, row_of_box, na=na, t=t_split)
    lanes = pad(na) * t_split + pad(ntb - na) * lmax
    return ((rmap_a, rows_a), (rmap_b, rows_b)), new_rob, lanes


@jax.jit
def _csr_lmax_nne(starts):
    lens = starts[1:] - starts[:-1]
    return jnp.stack([lens.max().astype(jnp.int64),
                      (lens > 0).sum().astype(jnp.int64)])


_csr_rows_j = jax.jit(csr_rows, static_argnums=1)


@partial(jax.jit, static_argnames=("ntb", "lmax"))
def _rowmap_from_csr(starts, lists, *, ntb, lmax):
    rows = csr_rows(starts, int(lists.shape[0])).astype(jnp.int32)
    return _rowmap_from_edges(rows, lists.astype(jnp.int32),
                              ntb=ntb, lmax=lmax)


def _digit_groups(digits, nchild):
    """Stable sort order + per-digit group sizes for a host digit array."""
    order = np.argsort(digits, kind="stable")
    sizes = np.bincount(digits, minlength=nchild).astype(np.int32)
    return order, sizes


class ExpansionWranglerBase(ExpansionWranglerInterface):
    """Kernel-independent expansion wrangler plumbing; see module doc."""

    #: complex (or real) dtype of expansion coefficients
    dtype = np.complex128

    #: set False by kernels whose source-side hooks cannot be
    #: JVP-differentiated (dipoles are implemented as directional
    #: derivatives of the hooks w.r.t. the source positions)
    _supports_dipoles = True

    #: set True by kernels whose operator/basis hooks implement the
    #: per-level rscale normalization (see :meth:`level_to_rscale`)
    _supports_rscale = False

    def __init__(self, tree_indep, traversal, dipole_vec=None,
                 dipoles_already_reordered=False, level_to_order=None,
                 rscale=None, dtype=None, m2l_mode="dense",
                 m2l_accurate=False):
        """:arg dipole_vec: optional ``(dim, nsources)`` array (user order
        unless *dipoles_already_reordered*).  When given, the sources are
        dipoles: the potential of source ``y`` with FMM weight ``w`` is
        ``w * (dipole_vec . grad_y) G(x, y)`` — the convention of the
        reference's pyfmmlib wrangler (``dipstr``/``dipvec`` packaging at
        ``boxtree/pyfmmlib_integration.py:495-511``; constructor
        ``:285,370-385``).  Implemented for every kernel at once by
        JVP-ing the P2M/P2L/P2P hooks in the per-source dipole direction.

        :arg level_to_order: optional ``level -> order`` callable (the
        reference's ``fmm_level_to_order``,
        ``boxtree/pyfmmlib_integration.py:331-368``).  Expansions are
        stored at the maximum order with the per-level tail masked to
        zero (static shapes), and translation operators are truncated to
        the participating levels' orders.

        :arg rscale: per-level expansion scaling for deep-tree numerical
        stability (``level_to_rscale``,
        ``boxtree/pyfmmlib_integration.py:393-402``): ``None`` (off),
        ``"auto"`` (``min(root_extent * 2^-level, 1)``), or an
        (nlevels,) array.  Scaled expansions keep every coefficient
        O(1): all basis evaluations run in box-size-normalized
        coordinates and the translation operators absorb the diagonal
        ``rscale^n`` rescaling.
        """
        super().__init__(tree_indep, traversal)
        self.m2l_accurate = bool(m2l_accurate)
        if dtype is not None:
            # reduced-precision expansions (e.g. complex64 for float32
            # trees — the float32 FMM path of ``test/test_fmm.py:672``)
            self.dtype = np.dtype(dtype).type
        tree = traversal.tree
        self.dim = tree.dimensions
        self.ncoeff = self._ncoeff()

        # {{{ per-level orders and rscale

        nlevels = tree.nlevels
        root_f = float(np.asarray(tree.root_extent))
        if level_to_order is not None:
            self.level_orders = np.array(
                [int(level_to_order(lev)) for lev in range(nlevels)])
            degrees = np.asarray(self._coeff_orders())
            mask = degrees[None, :] <= self.level_orders[:, None]
            self._coeff_mask = jnp.asarray(mask)
            self._coeff_mask_np = mask
        else:
            self.level_orders = None
            self._coeff_mask = None
            self._coeff_mask_np = None

        if rscale is None:
            self._rscale_np = None
            self._scale_of_level = None
        else:
            if not self._supports_rscale:
                raise NotImplementedError(
                    f"{type(self).__name__} does not implement rscale")
            if isinstance(rscale, str):
                if rscale != "auto":
                    raise ValueError(f"bad rscale: {rscale!r}")
                rs = np.minimum(
                    root_f * 2.0 ** -np.arange(nlevels)
                    * self._rscale_factor(), 1.0)
            else:
                rs = np.asarray(rscale, np.float64)
                if rs.shape != (nlevels,):
                    raise ValueError("rscale must have shape (nlevels,)")
            self._rscale_np = rs
            # real precision of the wrangler: an f64 scale would
            # promote f32 coordinates (and the whole P2M term chain) to
            # f64, tripping the f64->f32 scatter-dtype deprecation
            self._scale_of_level = jnp.asarray(
                rs, np.zeros(0, self.dtype).real.dtype)

        # }}}

        # particle blocks are cached properties: normally built at the
        # end of __init__ (stage methods may run under jit, where the
        # static pmax could no longer be computed), but with
        # ``_defer_blocks`` set — the sharded runner's local-particles
        # mode, which builds its per-rank blocks by exchange from
        # mesh-sharded coordinates — the replicated (nboxes, pmax, d)
        # arrays are never materialized at all
        self._src_blocks = self._tgt_blocks = None
        self._dip_blocks_cache = None

        if dipole_vec is not None:
            if not self._supports_dipoles:
                raise ValueError(
                    f"{type(self).__name__} does not support dipoles")
            dipole_vec = jnp.asarray(dipole_vec)
            if dipole_vec.shape != (self.dim, tree.nsources):
                raise ValueError("dipole_vec must have shape "
                                 "(dimensions, nsources)")
            if not dipoles_already_reordered:
                dipole_vec = dipole_vec[:, tree.user_source_ids]
        self.dipole_vec = dipole_vec

        self._lsb = tree.level_start_box_nrs
        self._ls_totp = np.asarray(
            traversal.level_start_target_or_target_parent_box_nrs)

        self.centers = tree.box_centers               # (d, nboxes)
        root = float(np.asarray(tree.root_extent))
        self.root_extent = root

        def r_of(lev):
            return (1.0 if self._rscale_np is None
                    else float(self._rscale_np[lev]))

        def trunc(mat, lev_rows, lev_cols):
            if self._coeff_mask_np is None:
                return mat
            keep = np.outer(self._coeff_mask_np[lev_rows],
                            self._coeff_mask_np[lev_cols])
            return np.where(keep, mat, 0)

        # M2L plan + operator table (one entry per used (level, class));
        # a traversal stand-in may carry the used keys directly (the
        # sharded runner discovers them with a psum'd histogram instead
        # of a global List-2 CSR)
        n = traversal.well_sep_is_n_away
        offs = _offsets(tree.dimensions, 2 * n + 1, min_inf_norm=n)
        used_keys = getattr(traversal, "m2l_used_keys", None)
        if used_keys is not None:
            self.m2l_plan = M2LPlan.from_used_keys(tree, offs, used_keys)
        else:
            self.m2l_plan = M2LPlan(traversal, offs)

        if m2l_mode not in ("dense", "rotation"):
            raise ValueError(f"bad m2l_mode: {m2l_mode!r}")
        self._m2l_rot = None
        if m2l_mode == "rotation":
            # point-and-shoot M2L (rotate / axial / rotate back), keyed
            # by the rotation classes — see models/rotation_m2l.py and
            # the reference's FMMLibRotationData
            # (boxtree/pyfmmlib_integration.py:557-607)
            if self.dim != 3:
                raise NotImplementedError("rotation M2L is 3D-only")
            if self._coeff_mask_np is not None:
                raise NotImplementedError(
                    "rotation M2L with level_to_order truncation")
            if self.m2l_plan.nops:
                from boxtree_tpu.models.rotation_m2l import RotationM2L
                self._m2l_rot = RotationM2L(self)

        if self.m2l_plan.nops and self._m2l_rot is None:
            ts, rs, levs = [], [], []
            for (lev, c) in self.m2l_plan.used:
                size = root / (1 << lev)
                # translation t = c_tgt - c_src = offset * box_size
                ts.append(self.m2l_plan.offsets[c].astype(np.float64)
                          * size)
                rs.append(r_of(lev))
                levs.append(lev)
            ts_np = np.stack(ts)
            rs_np = np.asarray(rs)
            if (type(self)._m2l_ops_device
                    is ExpansionWranglerBase._m2l_ops_device):
                mats = self._m2l_matrices(ts_np, rs_np)
                ops = [trunc(m, lev, lev).T
                       for m, lev in zip(mats, levs)]
                self._m2l_opsT = jnp.asarray(
                    np.stack(ops).astype(self.dtype))
            else:
                # Build the (nops, K, K) table ON DEVICE from the tiny
                # (nops, d) translation vectors: at order 8 / 3D the
                # dense table is ~130 MB, minutes of host->device upload
                # through a tunnel, while the inputs are ~30 KB
                # (doc/PERF.md; the reference reuses precomputed
                # operators per class the same way,
                # boxtree/translation_classes.py).
                keep = (None if self._coeff_mask_np is None
                        else self._coeff_mask_np[np.asarray(levs)])

                def build(ts_d, rs_d):
                    mats = self._m2l_ops_device(ts_d, rs_d)
                    if keep is not None:
                        k = jnp.asarray(keep)
                        mats = jnp.where(
                            k[:, :, None] & k[:, None, :], mats, 0)
                    return jnp.swapaxes(mats, 1, 2).astype(self.dtype)

                if jax.default_backend() != "cpu":
                    # one fused device program; eager on CPU (each eager
                    # op there is free, a jit costs a fresh compile)
                    build = jax.jit(build)
                # inputs in the wrangler's REAL precision: a float64
                # intermediate would promote to complex128, and the TPU
                # X64 rewriter rejects the f64->c128 convert outright
                real_dt = np.zeros(0, self.dtype).real.dtype
                self._m2l_opsT = build(
                    jnp.asarray(ts_np.astype(real_dt)),
                    jnp.asarray(rs_np.astype(real_dt)))
        else:
            self._m2l_opsT = jnp.zeros(
                (0, self.ncoeff, self.ncoeff), self.dtype)

        # populate the fast-path plans EAGERLY when they will run:
        # under a traced driver the lazy paths would call np.asarray on
        # traced group sizes (and cache tracers)
        self._m2l_parent = None
        if self._m2l_use_class_dense():
            if not (os.environ.get("BOXTREE_TPU_M2L_PARENT_DENSE",
                                   "1") == "1"
                    and self._build_m2l_parent_plan()):
                self.m2l_plan.class_dense()
        elif (self._m2l_rot is None and self.m2l_plan.nops
                and int(self.m2l_plan.tgt.shape[0])
                > self._M2L_EDGE_CHUNK):
            self.m2l_plan.tiled(self._M2L_TILE)

        self._tgt_row_of_box = None
        self._build_l1_row_plan(traversal)
        self._build_m2p_row_plan(traversal)
        self._build_p2l_row_plan(traversal)

        if not self._defer_blocks:
            self.src_blocks, self.tgt_blocks  # noqa: B018  (build now)
            if dipole_vec is not None:
                self._dip_blocks  # noqa: B018

        # per-(level, digit) M2M / L2L operator stacks (transposed for
        # row-vector application) + digit-sorted box plans
        nchild = 2 ** self.dim
        self._m2m_opsT = {}
        self._l2l_opsT = {}
        for lev in range(1, tree.nlevels):
            size = root / (1 << lev)
            m2m, l2l = [], []
            for digit in range(nchild):
                sign = np.array([
                    1.0 if (digit >> (self.dim - 1 - ax)) & 1 else -1.0
                    for ax in range(self.dim)])
                child_off = sign * (size / 2)   # c_child - c_parent
                # M2M translation: t = c_parent - c_child
                m2m.append(trunc(
                    self._m2m_matrix(-child_off, r_of(lev),
                                     r_of(lev - 1)),
                    lev - 1, lev).T)
                # L2L translation: t = c_child - c_parent
                l2l.append(trunc(
                    self._l2l_matrix(child_off, r_of(lev - 1),
                                     r_of(lev)),
                    lev, lev - 1).T)
            self._m2m_opsT[lev] = jnp.asarray(
                np.stack(m2m).astype(self.dtype))
            self._l2l_opsT[lev] = jnp.asarray(
                np.stack(l2l).astype(self.dtype))

        box_digit = (np.asarray(tree.box_morton_prefixes)
                     & (nchild - 1)).astype(np.int32)
        self.box_digit = jnp.asarray(box_digit)
        parents = np.asarray(tree.box_parent_ids)
        lsb = np.asarray(self._lsb)

        # upward (M2M) plan: per level, boxes sorted by child digit
        self._m2m_plan = {}
        for lev in range(tree.nlevels - 1, 2, -1):
            ids = np.arange(lsb[lev], lsb[lev + 1])
            if len(ids) == 0:
                continue
            order, sizes = _digit_groups(box_digit[ids], nchild)
            ids = ids[order]
            self._m2m_plan[lev] = (jnp.asarray(ids.astype(np.int32)),
                                   jnp.asarray(parents[ids].astype(
                                       np.int32)),
                                   jnp.asarray(sizes))

        # downward (L2L) plan: per level, totp rows sorted by digit
        totp = np.asarray(traversal.target_or_target_parent_boxes)
        self._l2l_plan = {}
        for lev in range(1, tree.nlevels):
            r0, r1 = int(self._ls_totp[lev]), int(self._ls_totp[lev + 1])
            if r1 == r0:
                continue
            ids = totp[r0:r1]
            order, sizes = _digit_groups(box_digit[ids], nchild)
            ids = ids[order]
            self._l2l_plan[lev] = (jnp.asarray(ids.astype(np.int32)),
                                   jnp.asarray(parents[ids].astype(
                                       np.int32)),
                                   jnp.asarray(sizes))

    # {{{ kernel hooks

    def _ncoeff(self):
        raise NotImplementedError

    def _coeff_orders(self):
        """(ncoeff,) int array: minimal expansion order containing each
        coefficient (drives per-level order truncation)."""
        return np.zeros(self.ncoeff, np.int64)

    def _rscale_factor(self):
        """Extra factor in the ``"auto"`` per-level rscale (the
        reference multiplies by ``|helmholtz_k|`` for oscillatory
        kernels, ``boxtree/pyfmmlib_integration.py:317,332,393-402``)."""
        return 1.0

    def _p2m_terms(self, rel, q, scale=1.0):
        """*rel* arrives pre-divided by the box's rscale (also passed as
        *scale*, shaped ``rel.shape[1:]`` or scalar 1.0; kernels with a
        non-homogeneous basis recover physical coordinates as
        ``rel * scale`` and apply their diagonal coefficient
        scaling)."""
        raise NotImplementedError

    def _l2p_eval(self, rel, loc, scale=1.0):
        """*rel* arrives pre-divided by the box's rscale (see
        :meth:`_p2m_terms` for *scale*)."""
        raise NotImplementedError

    def _m2p_eval(self, rel, mp, scale=1.0):
        """*rel* pre-divided by *scale* (the source box's rscale); the
        hook applies any residual scale factor of the scaled basis."""
        raise NotImplementedError

    def _p2l_terms(self, rel, q, scale=1.0):
        """*rel* pre-divided by *scale* (the target box's rscale)."""
        raise NotImplementedError

    def _p2p(self, tgt_pts, src_pts, src_valid, q):
        raise NotImplementedError

    def _m2m_matrix(self, t, r_child=1.0, r_parent=1.0):
        """Operator on rscaled expansions (identity scaling when both
        r args are 1)."""
        raise NotImplementedError

    def _l2l_matrix(self, t, r_parent=1.0, r_child=1.0):
        raise NotImplementedError

    def _m2l_matrix(self, t, r=1.0):
        raise NotImplementedError

    def _m2l_matrices(self, ts, rs):
        """Batched M2L operator build for (nops, dim) translations;
        kernels with vectorizable host bases override this (the loop
        fallback costs ~1 ms per matrix, which adds up at ~2k used
        (level, class) operators)."""
        return [self._m2l_matrix(t, float(r)) for t, r in zip(ts, rs)]

    def _m2l_ops_device(self, ts, rs):
        """Optional DEVICE-side batched M2L operator build: jnp ``(nops,
        dim)`` translations + ``(nops,)`` rscales in, ``(nops, K, K)``
        operator stack out (pure jnp, jit-safe).  Kernels that override
        it avoid uploading the dense operator table; the base-class
        definition marks the host fallback."""
        raise NotImplementedError

    # }}}

    # {{{ plumbing

    #: trailing dims of per-particle potentials: () for scalar output,
    #: (2,) for kernels whose complex potential is carried as [re, im]
    #: real lanes (the complex-free TPU path of the Helmholtz pairs
    #: wranglers)
    _pot_extra_dims = ()

    def multipole_expansion_zeros(self):
        return jnp.zeros((self.tree.nboxes, self.ncoeff), self.dtype)

    local_expansion_zeros = multipole_expansion_zeros

    def output_zeros(self):
        return jnp.zeros((self.tree.ntargets, *self._pot_extra_dims),
                         self.dtype)

    def potential_box_map(self):
        """Box id owning each output-potential slot (used by the
        distributed runner for responsibility masking)."""
        return self.tree.box_id_of_target

    def reorder_sources(self, source_array):
        return jnp.asarray(source_array)[self.tree.user_source_ids]

    def reorder_potentials(self, potentials):
        return potentials[self.tree.sorted_target_ids]

    def multipole_expansions_view(self, mpole_exps, level):
        return mpole_exps[self._lsb[level]:self._lsb[level + 1]]

    local_expansions_view = multipole_expansions_view

    def finalize_potentials(self, potentials):
        return potentials

    def _target_block_to_particles(self, pot_box_blocks):
        """(nboxes, pmax) block potentials -> per-target-particle values."""
        tree = self.tree
        off = (jnp.arange(tree.ntargets, dtype=jnp.int64)
               - tree.box_target_starts.astype(jnp.int64)[
                   tree.box_id_of_target])
        return pot_box_blocks[tree.box_id_of_target, off]

    #: edges per scan trip in the P2P/M2P/P2L stages (tunable per
    #: instance for benchmarking)
    _EDGE_CHUNK = _EDGE_CHUNK

    def _pad_edges(self, *arrays):
        chunk = self._EDGE_CHUNK
        nedges = int(arrays[0].shape[0])
        npad = max(chunk, -(-nedges // chunk) * chunk)
        padded = [jnp.pad(a, (0, npad - nedges)) for a in arrays]
        valid = jnp.pad(jnp.ones(nedges, bool), (0, npad - nedges))
        return padded, valid, npad // chunk

    @staticmethod
    def _sanitize_edges(tgt_e, src_e, valid_e):
        valid = (tgt_e >= 0) & (src_e >= 0)
        if valid_e is not None:
            valid = valid & valid_e
        return jnp.clip(tgt_e, 0), jnp.clip(src_e, 0), valid

    # }}}

    # {{{ P2M

    def form_multipoles(self, level_start_source_box_nrs, source_boxes,
                        src_weight_vecs):
        src_weights, = src_weight_vecs
        tree = self.tree
        rel = tree.sources - self.centers[:, tree.box_id_of_source]
        if self._scale_of_level is not None:
            s = self._scale_of_level[tree.box_levels[
                tree.box_id_of_source]]
            rel = rel / s
        else:
            s = None
        sarg = 1.0 if s is None else s
        if self.dipole_vec is None:
            terms = self._p2m_terms(rel, src_weights,
                                    scale=sarg)     # (nsources, K)
        else:
            dip = self.dipole_vec.astype(rel.dtype)
            if s is not None:
                dip = dip / s                      # chain rule d(rel/s)
            _, terms = jax.jvp(
                lambda r: self._p2m_terms(r, src_weights, scale=sarg),
                (rel,), (dip,))
        mp = self.multipole_expansion_zeros()
        mp = mp.at[tree.box_id_of_source].add(terms.astype(mp.dtype))
        if self._coeff_mask is not None:
            mp = mp * self._coeff_mask[tree.box_levels]
        return mp

    # }}}

    # {{{ M2M / L2L

    def coarsen_multipoles(self, level_start_source_parent_box_nrs,
                           source_parent_boxes, mpoles):
        tree = self.tree
        for lev in range(tree.nlevels - 1, 2, -1):
            plan = self._m2m_plan.get(lev)
            if plan is None:
                continue
            ids, par, sizes = plan
            shifted = grouped_matmul(mpoles[ids], self._m2m_opsT[lev],
                                     sizes)
            mpoles = mpoles.at[par].add(shifted)
        return mpoles

    def coarsen_multipoles_rows_grouped(self, rows, digit_sizes,
                                        level_slices, mpoles):
        """Upward M2M restricted to an explicit (level, digit)-sorted
        padded row set — the distributed runner's per-rank owned +
        ancestor boxes (the analogue of the reference's
        ``source_parent_boxes_mask`` restriction,
        ``local_traversal.py:34-62``): boxes outside a rank's
        contributing set hold zero partial multipoles, so skipping them
        changes nothing and saves the redundant full-skeleton M2M.

        Same row-plan contract as :meth:`refine_locals_rows_grouped`;
        *level_slices* must come in DESCENDING level order.
        """
        tree = self.tree
        parents = tree.box_parent_ids
        for lev, s0, s1 in level_slices:
            ids = rows[s0:s1]
            shifted = grouped_matmul(mpoles[jnp.clip(ids, 0)],
                                     self._m2m_opsT[lev],
                                     digit_sizes[lev])
            mpoles = mpoles.at[
                jnp.where(ids >= 0,
                          parents[jnp.clip(ids, 0)].astype(jnp.int64),
                          tree.nboxes)].add(shifted, mode="drop")
        return mpoles

    def refine_locals(self, level_start_target_or_target_parent_box_nrs,
                      target_or_target_parent_boxes, local_exps):
        tree = self.tree
        for lev in range(1, tree.nlevels):
            plan = self._l2l_plan.get(lev)
            if plan is None:
                continue
            ids, par, sizes = plan
            shifted = grouped_matmul(local_exps[par],
                                     self._l2l_opsT[lev], sizes)
            local_exps = local_exps.at[ids].add(shifted)
        return local_exps

    def refine_locals_rows_grouped(self, rows, digit_sizes, level_slices,
                                   local_exps):
        """Downward L2L restricted to an explicit (level, digit)-sorted
        padded row set — ONE grouped matmul per level, the distributed
        runner's per-rank responsible+ancestor chains.

        :arg rows: (R,) box ids sorted by (level, child digit), -1
            padding at the tail of each level block.
        :arg digit_sizes: (nlevels, 2^d) per-level digit group sizes
            (level-block padding counted in the last digit group;
            padded rows are dropped by their -1 id).
        :arg level_slices: static ``(level, start, stop)`` tuples into
            *rows* (identical across SPMD ranks).
        """
        tree = self.tree
        parents = tree.box_parent_ids
        for lev, s0, s1 in level_slices:
            ids = rows[s0:s1]
            par = parents[jnp.clip(ids, 0)]
            shifted = grouped_matmul(local_exps[par],
                                     self._l2l_opsT[lev],
                                     digit_sizes[lev])
            local_exps = local_exps.at[
                jnp.where(ids >= 0, ids, tree.nboxes)].add(
                    shifted, mode="drop")
        return local_exps

    # }}}

    # {{{ M2L

    #: tile / tile-batch of the tile-aligned M2L path (dense mode)
    _M2L_TILE = 512
    _M2L_TILE_BATCH = 8
    #: rows per chunk of the class-dense M2L path, and the cap on its
    #: (nboxes, nclasses) map memory
    _M2L_DENSE_ROWS = 256
    _M2L_DENSE_MAP_BYTES = 1 << 30

    def _m2l_use_class_dense(self):
        plan = self.m2l_plan
        return (self._m2l_rot is None and plan.nops
                and int(plan.tgt.shape[0]) > self._M2L_EDGE_CHUNK
                and 4 * self.tree.nboxes * plan.nclasses
                <= self._M2L_DENSE_MAP_BYTES
                and os.environ.get("BOXTREE_TPU_M2L_CLASS_DENSE",
                                   "1") == "1")

    #: when True, new wranglers skip building the replicated particle
    #: blocks at construction (the sharded runner's local-particles
    #: mode toggles this around its wrangler_factory call; stage
    #: methods that need the blocks must then not run under jit before
    #: first use)
    _defer_blocks = False

    @property
    def src_blocks(self):
        """Padded per-box source particle blocks, built eagerly at
        construction unless ``_defer_blocks`` (the sharded runner's
        local-particles mode exchanges per-rank blocks from
        mesh-sharded coordinates instead and never touches these
        replicated arrays)."""
        if self._src_blocks is None:
            self._src_blocks = ParticleBlocks(self.tree, "source")
        return self._src_blocks

    @property
    def tgt_blocks(self):
        if self._tgt_blocks is None:
            if self.tree.sources_are_targets:
                self._tgt_blocks = self.src_blocks
            else:
                self._tgt_blocks = ParticleBlocks(self.tree, "target")
        return self._tgt_blocks

    @property
    def _dip_blocks(self):
        """(nboxes, pmax, d) dipole blocks (lazy, like src_blocks)."""
        if self._dip_blocks_cache is None:
            self._dip_blocks_cache = jnp.stack(
                [self.src_blocks.gather_values(self.dipole_vec[ax])
                 for ax in range(self.dim)], axis=-1)
        return self._dip_blocks_cache

    #: with True, ONLY the M2L operator matmuls run at
    #: ``Precision.HIGHEST`` (6-pass f32 emulation on the MXU).  M2L is
    #: the one matmul-bound stage, so this recovers the truncation
    #: floor (3.3e-5 at order 8, doc/PERF.md Config-D analysis) at a
    #: fraction of the global JAX_DEFAULT_MATMUL_PRECISION=highest
    #: cost (m2l 0.49 -> 1.07 s at 1e6/order 8; every other stage
    #: keeps the fast bf16-pass path).
    m2l_accurate = False

    def _m2l_precision_ctx(self):
        import contextlib
        if self.m2l_accurate:
            return jax.default_matmul_precision("highest")
        return contextlib.nullcontext()

    def multipole_to_local(self, level_start_target_or_target_parent_box_nrs,
                           target_or_target_parent_boxes, starts, lists,
                           mpole_exps):
        plan = self.m2l_plan
        with self._m2l_precision_ctx():
            if getattr(self, "_m2l_parent", None) is not None:
                return self._m2l_parent_dense(mpole_exps)
            if self._m2l_use_class_dense():
                return self._m2l_class_dense(mpole_exps)
            if (self._m2l_rot is None and plan.nops
                    and int(plan.tgt.shape[0]) > self._M2L_EDGE_CHUNK):
                return self._m2l_tiled(mpole_exps)
            return self.multipole_to_local_edges(
                plan.tgt, plan.src, plan.group_sizes, mpole_exps)

    def _m2l_class_dense(self, mpole_exps):
        """Scatter-free M2L: per level the target box ids are one
        contiguous range, so with the (nboxes, nclasses) class->source
        map each row chunk is ONE (rows, C*K) x (C*K, K) matmul —
        MXU-shaped, single gather per row, pure contiguous writes.
        Rows a chunk pads past its level boundary are masked to zero
        and overwritten when their own (later) level runs.

        The stage is GATHER-bound (~nboxes * C mpole rows); in the
        default-precision mode the MXU consumes bf16 passes anyway, so
        the gather operand is pre-cast to bf16 — half the traffic,
        bitwise-equivalent products (m2l_accurate keeps f32 end to
        end).  Accumulation stays f32 via preferred_element_type."""
        cmap, level_opid = self.m2l_plan.class_dense()
        base = self.local_expansion_zeros()
        bc = self._M2L_DENSE_ROWS
        nrows = base.shape[0]
        out = jnp.zeros((nrows + bc,) + base.shape[1:], base.dtype)
        c = cmap.shape[1]
        k = self._m2l_opsT.shape[1]
        lsb = [int(x) for x in self._lsb]
        nlevels = len(lsb) - 1

        halve = (not self.m2l_accurate
                 and mpole_exps.dtype == jnp.float32
                 and jax.default_backend() != "cpu")
        mpe = mpole_exps.astype(jnp.bfloat16) if halve else mpole_exps
        acc = mpole_exps.dtype

        for lev in range(nlevels):
            opid_l = level_opid[lev]                    # np (C,)
            b0, b1 = lsb[lev], lsb[lev + 1]
            if b1 == b0 or (opid_l < 0).all():
                continue
            used = jnp.asarray(opid_l >= 0)
            ops_l = jnp.where(
                used[:, None, None],
                self._m2l_opsT[jnp.asarray(
                    np.clip(opid_l, 0, None).astype(np.int64))], 0)
            ops_flat = ops_l.reshape(c * k, k)
            if halve:
                ops_flat = ops_flat.astype(jnp.bfloat16)
            nch = -(-(b1 - b0) // bc)

            def body(carry, i, *, b0=b0, b1=b1, ops_flat=ops_flat):
                ids0 = b0 + i * bc
                rows = ids0 + jnp.arange(bc, dtype=jnp.int64)
                src = lax.dynamic_slice(
                    cmap, (ids0, jnp.int64(0)), (bc, c))
                mpg = mpe[jnp.clip(src, 0).astype(jnp.int64)]
                mpg = jnp.where((src >= 0)[..., None], mpg, 0)
                y = jnp.matmul(mpg.reshape(bc, c * k), ops_flat,
                               preferred_element_type=acc)
                y = jnp.where((rows < b1)[:, None], y, 0)
                return lax.dynamic_update_slice(
                    carry, y.astype(carry.dtype),
                    (ids0, jnp.int64(0))), None

            out, _ = lax.scan(body, out,
                              jnp.arange(nch, dtype=jnp.int64))
        return out[:nrows]

    #: parent rows per scan trip of the parent-block M2L
    _M2L_PARENT_ROWS = 256

    def _build_m2l_parent_plan(self):
        """Parent-block M2L setup: List 2 of every child of a parent P
        is (children of P's same-level-non-well-sep boxes, well-sep
        test static per (colleague offset, source digit, target
        digit)) — so ONE gathered (2^d * K) mpole row per (parent,
        colleague) serves all 2^d children through a single
        (m*2^d*K, 2^d*K) matmul whose operator blocks are static per
        level.  ~2^d fewer gather rows than the class-dense map (the
        stage is gather-ROW-count bound: ~13 ns/row regardless of
        width, doc/PERF.md r5) and fewer FLOPs (m*4^d*K^2 vs
        (4n+3)^d*2^d*K^2 per parent).

        The pair set is validated against the traversal's edge count at
        setup (one device reduction): masked/exotic traversals whose
        List 2 is not the static closure fall back to
        :meth:`_m2l_class_dense`.  Returns True iff active."""
        trav = self.traversal
        tree = self.tree
        plan = self.m2l_plan
        d = tree.dimensions
        n_aw = int(getattr(trav, "well_sep_is_n_away", 1))
        width = 2 * n_aw + 1
        m = width ** d
        nchild = 2 ** d
        nboxes = tree.nboxes
        nlevels = tree.nlevels
        from boxtree_tpu.ops import morton as _morton

        starts = trav.same_level_non_well_sep_boxes_starts
        lists = trav.same_level_non_well_sep_boxes_lists
        nedges = int(lists.shape[0])
        if nedges == 0 or plan.nops == 0:
            return False

        # static (lev, j, q_s, q_t) -> operator id (host, tiny):
        # vec(tgt - src) = cell(q_t) - cell(q_s) - 2 * off_j
        level_opid = np.full((nlevels, plan.nclasses), -1, np.int32)
        for i_op, key in enumerate(plan._used_keys):
            level_opid[int(key) // plan.nclasses,
                       int(key) % plan.nclasses] = i_op
        w_off = width ** np.arange(d)
        offs = np.stack([(np.arange(m) // w_off[a]) % width - n_aw
                         for a in range(d)], axis=1)       # (m, d)
        cq = np.asarray(_morton.deinterleave(
            jnp.arange(nchild, dtype=jnp.int64), d)).T     # (2^d, d)
        vec = (cq[None, None, :, :] - cq[None, :, None, :]
               - 2 * offs[:, None, None, :])         # (m, qs, qt, d)
        r = plan._radius
        in_r = ((vec + r >= 0) & (vec + r < 2 * r + 1)).all(axis=-1)
        lin = ((vec + r) * plan._weights).sum(axis=-1)
        cls = np.where(in_r, plan._table[np.clip(lin, 0, None)], -1)
        opid = np.where(cls[None] >= 0,
                        level_opid[:, np.clip(cls, 0, None)],
                        -1)                       # (nlevels, m, qs, qt)

        # (nboxes, m) offset-slotted slnws map + totp mask + the pair
        # count self-check, one jitted setup program
        child_t = tree.box_child_ids                  # (2^d, nboxes)
        opid_any = jnp.asarray((opid >= 0).any(axis=(2, 3)))  # (L, m)
        opid_cnt = jnp.asarray(opid >= 0)         # (L, m, qs, qt) bool

        @partial(jax.jit, static_argnames=())
        def setup(prefixes, levels, starts, lists, totp_ids, child_t):
            rows = csr_rows(starts, nedges)
            cells = _morton.deinterleave(prefixes, d)
            off = (cells[:, lists.astype(jnp.int64)]
                   - cells[:, rows])                     # (d, E)
            slot = jnp.zeros(nedges, jnp.int64)
            for a in range(d):
                slot = slot + (off[a] + n_aw) * int(w_off[a])
            ok = ((off + n_aw >= 0) & (off + n_aw < width)).all(axis=0)
            pmap = jnp.full((nboxes + 1, m), -1, jnp.int32)
            pmap = pmap.at[jnp.where(ok, rows, nboxes),
                           jnp.clip(slot, 0, m - 1)].set(
                lists.astype(jnp.int32), mode="drop")
            pmap = pmap[:nboxes]
            totp = jnp.zeros(nboxes + 1, bool).at[
                totp_ids.astype(jnp.int64)].set(True)
            # static pair count must equal the traversal's edge count
            cnt = jnp.int64(0)
            for lev in range(1, nlevels):
                pm_l = pmap[self._lsb[lev - 1]:self._lsb[lev]]
                ch_l = child_t[:, self._lsb[lev - 1]:self._lsb[lev]]
                src_ok = child_t[:, jnp.clip(pm_l, 0).astype(jnp.int64)
                                 ] > 0                 # (qs, np, m)
                src_ok &= (pm_l > -1)[None]
                tgt_ok = (ch_l > 0) & totp[jnp.clip(ch_l, 0).astype(
                    jnp.int64)]                        # (qt, np)
                cnt = cnt + (src_ok.transpose(1, 2, 0)[:, :, :, None]
                             & tgt_ok.T[:, None, None, :]
                             & opid_cnt[lev][None]).sum()
            return pmap, totp, cnt

        pmap, totp, cnt = setup(
            tree.box_morton_prefixes, tree.box_levels, starts, lists,
            trav.target_or_target_parent_boxes, child_t)
        if int(cnt) != int(plan.tgt.shape[0]):
            return False
        self._m2l_parent = (pmap, opid, m, child_t, totp)
        return True

    def _m2l_parent_dense(self, mpole_exps):
        """Parent-block M2L execution (see _build_m2l_parent_plan)."""
        pmap, opid, m, child_t, totp = self._m2l_parent
        tree = self.tree
        nchild = 2 ** tree.dimensions
        k = self._m2l_opsT.shape[1]
        lsb = [int(x) for x in self._lsb]
        nboxes = tree.nboxes
        base = self.local_expansion_zeros()
        out = base
        bc = self._M2L_PARENT_ROWS

        halve = (not self.m2l_accurate
                 and mpole_exps.dtype == jnp.float32
                 and jax.default_backend() != "cpu")
        mpe = mpole_exps.astype(jnp.bfloat16) if halve else mpole_exps
        acc = mpole_exps.dtype

        for lev in range(1, len(lsb) - 1):
            op_l = opid[lev]                           # (m, qs, qt)
            if (op_l < 0).all():
                continue
            p0, p1 = lsb[lev - 1], lsb[lev]
            npl = p1 - p0

            chT = child_t[:, p0:p1].T.astype(jnp.int64)   # (np, 2^d)
            mp8 = mpe[jnp.clip(chT, 0)]
            mp8 = jnp.where((chT > 0)[..., None], mp8, 0)
            mp8 = mp8.reshape(npl, nchild * k)
            mp8 = jnp.concatenate(
                [mp8, jnp.zeros((1, nchild * k), mp8.dtype)])

            og = self._m2l_opsT[np.clip(op_l, 0, None)]  # (m,qs,qt,K,K)
            w_t = jnp.where(jnp.asarray(op_l >= 0)[..., None, None],
                            og, 0)
            w_t = w_t.transpose(0, 1, 3, 2, 4).reshape(
                m * nchild * k, nchild * k)
            if halve:
                w_t = w_t.astype(jnp.bfloat16)

            npad = -(-npl // bc) * bc
            pml = jnp.where(pmap[p0:p1] >= 0,
                            pmap[p0:p1].astype(jnp.int64) - p0, npl)
            pml = jnp.concatenate(
                [pml, jnp.full((npad - npl, m), npl, jnp.int64)])
            ch_pad = jnp.concatenate(
                [chT, jnp.zeros((npad - npl, nchild), jnp.int64)])
            ok_pad = jnp.concatenate(
                [(chT > 0) & totp[jnp.clip(chT, 0)],
                 jnp.zeros((npad - npl, nchild), bool)])

            def body(carry, i, *, pml=pml, ch_pad=ch_pad,
                     ok_pad=ok_pad, w_t=w_t, mp8=mp8, npl=npl):
                r0 = i * bc
                sl = lax.dynamic_slice(pml, (r0, jnp.int64(0)),
                                       (bc, m))
                g = mp8[sl]                            # (bc, m, 2^d*K)
                y = jnp.matmul(g.reshape(bc, m * nchild * k), w_t,
                               preferred_element_type=acc)
                cids = lax.dynamic_slice(ch_pad, (r0, jnp.int64(0)),
                                         (bc, nchild))
                ok = lax.dynamic_slice(ok_pad, (r0, jnp.int64(0)),
                                       (bc, nchild))
                rows = jnp.where(ok, cids, nboxes).reshape(-1)
                return carry.at[rows].set(
                    y.reshape(bc * nchild, k).astype(carry.dtype),
                    mode="drop", unique_indices=True), None

            out, _ = lax.scan(body, out,
                              jnp.arange(npad // bc, dtype=jnp.int64))
        return out

    def _m2l_tiled(self, mpole_exps):
        """Dense M2L over the tile-aligned plan: a scan over batches of
        fixed-size tiles, each batch ONE (B, tile, K) x (B, K, K)
        batched matmul (MXU-shaped), with per-tile operator gathers."""
        nboxes = self.tree.nboxes
        local_exps = self.local_expansion_zeros()
        t = self._M2L_TILE
        b = self._M2L_TILE_BATCH
        tgt_t, src_t, tile_gid = self.m2l_plan.tiled(t)
        ntiles = tile_gid.shape[0]
        nb = -(-ntiles // b)
        padt = nb * b - ntiles
        if padt:
            tgt_t = jnp.concatenate(
                [tgt_t, jnp.full(padt * t, -1, tgt_t.dtype)])
            src_t = jnp.concatenate(
                [src_t, jnp.zeros(padt * t, src_t.dtype)])
            tile_gid = jnp.concatenate(
                [tile_gid, jnp.zeros(padt, tile_gid.dtype)])

        def body(carry, inp):
            tg, sc, gd = inp                    # (b*t,), (b*t,), (b,)
            mp = mpole_exps[jnp.clip(sc, 0).astype(jnp.int64)]
            mp = jnp.where((tg >= 0)[:, None], mp, 0)
            y = jnp.einsum(
                "btk,bkj->btj",
                mp.reshape(b, t, -1),
                self._m2l_opsT[gd.astype(jnp.int64)],
                preferred_element_type=mp.dtype)
            safe = jnp.where(tg >= 0, tg, nboxes).astype(jnp.int64)
            return carry.at[safe].add(
                y.reshape(b * t, -1), mode="drop"), None

        local_exps, _ = lax.scan(
            body, local_exps,
            (tgt_t.reshape(nb, b * t), src_t.reshape(nb, b * t),
             tile_gid.reshape(nb, b)))
        return local_exps

    #: max edges per M2L chunk: bounds the (chunk, ncoeff) gather /
    #: matmul / scatter buffers to a few hundred MB.  The one-shot
    #: full-edge-set formulation allocated 3-4 (E, K) temporaries —
    #: ~5 GB each at 1e6 particles / order 8 — which the TPU compiler's
    #: buffer assignment rejects outright (the staged-probe HTTP 500,
    #: scripts/tpu_probe_stages.py).
    _M2L_EDGE_CHUNK = 1 << 19

    def multipole_to_local_edges(self, tgt_e, src_e, group_sizes,
                                 mpole_exps):
        """M2L over flat edge arrays pre-sorted by operator id (see
        :class:`~boxtree_tpu.models.particle_blocks.M2LPlan`); edges
        padded with -1 targets are dropped.  Large edge sets stream
        through a ``lax.scan`` over fixed-size chunks (the same pattern
        as the P2P/M2P/P2L stages), with per-chunk group sizes read off
        the global group-start cumsum."""
        nboxes = self.tree.nboxes
        local_exps = self.local_expansion_zeros()
        e = tgt_e.shape[0]
        if e == 0:
            return local_exps

        def apply_ops(mp_c, sizes_c):
            with self._m2l_precision_ctx():
                if self._m2l_rot is not None:
                    return self._m2l_rot.apply(mp_c, sizes_c)
                return grouped_matmul(mp_c, self._m2l_opsT, sizes_c)

        c = self._M2L_EDGE_CHUNK
        if e <= c:
            mp = mpole_exps[jnp.clip(src_e, 0)]
            mp = jnp.where((tgt_e >= 0)[:, None], mp, 0)
            out = apply_ops(mp, group_sizes)
            safe = jnp.where(tgt_e >= 0, tgt_e, nboxes)
            return local_exps.at[safe].add(out, mode="drop")

        nchunks = -(-e // c)
        pad = nchunks * c - e
        tgt_p = jnp.concatenate([tgt_e, jnp.full(pad, -1, tgt_e.dtype)])
        src_p = jnp.concatenate([src_e, jnp.zeros(pad, src_e.dtype)])
        gstart = jnp.concatenate(
            [jnp.zeros(1, jnp.int64),
             jnp.cumsum(group_sizes.astype(jnp.int64))])
        lo = (jnp.arange(nchunks, dtype=jnp.int64) * c)[:, None]
        sizes = (jnp.clip(gstart[None, 1:], lo, lo + c)
                 - jnp.clip(gstart[None, :-1], lo, lo + c)).astype(
                     group_sizes.dtype)                 # (nchunks, nops)

        def body(carry, inp):
            tgt_c, src_c, sizes_c = inp
            mp_c = mpole_exps[jnp.clip(src_c, 0)]
            mp_c = jnp.where((tgt_c >= 0)[:, None], mp_c, 0)
            out = apply_ops(mp_c, sizes_c)
            safe = jnp.where(tgt_c >= 0, tgt_c, nboxes)
            return carry.at[safe].add(out, mode="drop"), None

        local_exps, _ = jax.lax.scan(
            body, local_exps,
            (tgt_p.reshape(nchunks, c), src_p.reshape(nchunks, c),
             sizes))
        return local_exps

    # }}}

    # {{{ P2P

    #: target rows per scan trip of the row-major List-1 P2P
    _P2P_ROW_CHUNK = 128

    def eval_direct(self, target_boxes, neighbor_sources_starts,
                    neighbor_sources_lists, src_weight_vecs):
        src_weights, = src_weight_vecs
        nedges = int(neighbor_sources_lists.shape[0])
        if nedges == 0:
            return self.output_zeros()

        # row-major fast path for the standard List-1 call (identity
        # check works under tracing: the driver passes the wrangler's
        # own traversal fields)
        if (self._l1_rowmaps is not None
                and neighbor_sources_starts
                is self.traversal.neighbor_source_boxes_starts):
            return self._eval_direct_rowmajor(src_weights)

        rows = csr_rows(neighbor_sources_starts, nedges)
        return self.eval_direct_edges(
            target_boxes[rows], neighbor_sources_lists, None, src_weights)

    def _build_l1_row_plan(self, traversal):
        """Padded List-1 neighbor maps + target-row-of-box map, for the
        row-major P2P: one source-block gather per (row, slot) and pure
        contiguous writes, replacing the edge formulation's 4 gathers +
        1 scatter per edge (the FMM stage profile's dominant stage,
        doc/PERF.md).

        TWO-TIER maps (r4): padding every row to the global max length
        wasted ~59% of the pair lanes at 1e6 (lmax 54 vs mean 22.3 —
        the long rows are the rare coarse-fine boundary ones).  Rows
        are split at a device-chosen threshold T minimizing
        ``nA*T + nB*lmax`` over a candidate grid; each bucket runs the
        same scan at its own width, and the bucket permutation is
        composed into the row-of-box indirection the final
        per-particle gather already uses (zero extra cost there)."""
        self._l1_rowmaps = None
        if np.issubdtype(np.dtype(self.dtype), np.complexfloating):
            return                      # complex path: CPU-only, keep old
        lists = traversal.neighbor_source_boxes_lists
        if int(lists.shape[0]) == 0:
            return
        starts = traversal.neighbor_source_boxes_starts
        ntb = int(starts.shape[0]) - 1
        lmax = int(_csr_lmax(starts))                  # scalar pull
        if not 0 < lmax <= 1024:
            return
        full = _rowmap_from_csr(starts, lists, ntb=ntb, lmax=lmax)
        self._l1_rowmaps, self._l1_row_of_box, _ = _bucket_rowmap(
            full, traversal.target_boxes, self._tgt_row_of_box_arr(),
            self._P2P_ROW_CHUNK)

    def _tgt_row_of_box_arr(self):
        """(nboxes + 1,) map: global box id -> its row in
        ``traversal.target_boxes`` (shared by the row-major P2P/M2P
        output-to-particle mapping)."""
        if self._tgt_row_of_box is None:
            tb_ids = self.traversal.target_boxes
            self._tgt_row_of_box = jnp.zeros(
                self.tree.nboxes + 1, jnp.int32).at[
                tb_ids.astype(jnp.int64)].set(
                jnp.arange(tb_ids.shape[0], dtype=jnp.int32))
        return self._tgt_row_of_box

    def _eval_direct_rowmajor(self, src_weights):
        tree = self.tree
        tb, sb = self.tgt_blocks, self.src_blocks
        bt = self._P2P_ROW_CHUNK
        d = self.dim
        pm = sb.pmax

        q_blocks = sb.gather_values(src_weights.astype(self.dtype))
        lanes = [sb.points,
                 sb.mask.astype(sb.points.dtype)[..., None],
                 q_blocks[..., None].astype(sb.points.dtype)]
        if self.dipole_vec is not None:
            lanes.append(self._dip_blocks.astype(sb.points.dtype))
        pack = jnp.concatenate(lanes, axis=-1)
        nlane = pack.shape[-1]
        # FLATTEN the gather operand to (nboxes+1, pm*nlane): gathers
        # whose slice minor dim is below the 128-lane width serialize
        # on this TPU (measured 10x — 538 vs 54 ms for the same
        # 3.6M-row gather, doc/PERF.md r5); gather flat rows and
        # reshape back after
        pack = pack.reshape(pack.shape[0], pm * nlane)
        pack = jnp.concatenate(
            [pack, jnp.zeros((1, pm * nlane), pack.dtype)])
        tpts_flat = jnp.concatenate(
            [tb.points.reshape(tb.points.shape[0], tb.pmax * d),
             jnp.zeros((1, tb.pmax * d), tb.points.dtype)])

        # bucketed row scans (see _build_l1_row_plan): each bucket's
        # rows run at their own padded width; outputs stack in bucket
        # order, which the permuted row-of-box map already points at
        outs = []
        for rmap, tboxes in self._l1_rowmaps:
            ntb, lmax = rmap.shape
            ntb_pad = -(-ntb // bt) * bt
            rmap_p = jnp.concatenate(
                [rmap, jnp.full((ntb_pad - ntb, lmax), -1, rmap.dtype)])
            tboxes_p = jnp.concatenate(
                [tboxes.astype(jnp.int64),
                 jnp.zeros(ntb_pad - ntb, jnp.int64)])

            out = jnp.zeros((ntb_pad, tb.pmax, *self._pot_extra_dims),
                            self.dtype)

            def body(carry, i, rmap_p=rmap_p, tboxes_p=tboxes_p,
                     lmax=lmax):
                r0 = i * bt
                tbox = lax.dynamic_slice(tboxes_p, (r0,), (bt,))
                tpts = tpts_flat[tbox].reshape(bt, tb.pmax, d)
                nbr = lax.dynamic_slice(rmap_p, (r0, jnp.int64(0)),
                                        (bt, lmax))
                sp = pack[jnp.where(nbr >= 0, nbr,
                                    tree.nboxes).astype(jnp.int64)]
                sp = sp.reshape(bt, lmax, pm, nlane)
                spts = sp[..., :d].reshape(bt, lmax * pm, d)
                sval = sp[..., d].reshape(bt, lmax * pm) > 0
                qv = sp[..., d + 1].reshape(bt, lmax * pm).astype(
                    self.dtype)
                if self.dipole_vec is None:
                    vals = jax.vmap(self._p2p)(tpts, spts, sval, qv)
                else:
                    dip = sp[..., d + 2:].reshape(bt, lmax * pm, d)

                    def per_box(tp, s, v, qq, dd):
                        return jax.jvp(
                            lambda ss: self._p2p(tp, ss, v, qq),
                            (s,), (dd,))[1]
                    vals = jax.vmap(per_box)(tpts, spts, sval, qv, dip)
                idx = (r0,) + (jnp.int64(0),) * (carry.ndim - 1)
                return lax.dynamic_update_slice(
                    carry, vals.astype(carry.dtype), idx), None

            out, _ = lax.scan(body, out,
                              jnp.arange(ntb_pad // bt, dtype=jnp.int64))
            outs.append(out)
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)

        row = self._l1_row_of_box[
            tree.box_id_of_target.astype(jnp.int64)].astype(jnp.int64)
        off = (jnp.arange(tree.ntargets, dtype=jnp.int64)
               - tree.box_target_starts.astype(jnp.int64)[
                   tree.box_id_of_target])
        return out[row, off]

    def eval_direct_edges(self, tgt_e, src_e, valid_e, src_weights):
        """List-1 P2P over flat (target box, source box) edges; returns
        per-target-particle potentials."""
        tree = self.tree
        tb, sb = self.tgt_blocks, self.src_blocks
        tgt_e, src_e, valid = self._sanitize_edges(tgt_e, src_e, valid_e)
        q_blocks = self.src_blocks.gather_values(
            src_weights.astype(self.dtype))

        if self.dipole_vec is None:
            def edge_potential(t_box, s_box):
                return self._p2p(tb.points[t_box], sb.points[s_box],
                                 sb.mask[s_box], q_blocks[s_box])
        else:
            def edge_potential(t_box, s_box):
                def f(sp):
                    return self._p2p(tb.points[t_box], sp,
                                     sb.mask[s_box], q_blocks[s_box])
                return jax.jvp(
                    f, (sb.points[s_box],),
                    (self._dip_blocks[s_box].astype(
                        sb.points.dtype),))[1]

        (tgts, srcs), pad_valid, nchunks = self._pad_edges(
            tgt_e, src_e)
        valid = jnp.pad(valid, (0, pad_valid.shape[0] - valid.shape[0])) \
            & pad_valid

        pot_box = jnp.zeros(
            (tree.nboxes + 1, tb.pmax, *self._pot_extra_dims),
            self.dtype)

        def body(carry, inp):
            pot_box = carry
            tr, sr, vv = inp
            vals = jax.vmap(edge_potential)(tr, sr)
            safe = jnp.where(vv, tr, tree.nboxes)
            return pot_box.at[safe].add(vals, mode="drop"), None

        pot_box, _ = lax.scan(
            body, pot_box,
            (tgts.reshape(nchunks, -1), srcs.reshape(nchunks, -1),
             valid.reshape(nchunks, -1)))
        return self._target_block_to_particles(pot_box[:tree.nboxes])

    # }}}

    # {{{ M2P

    #: target rows per scan trip of the row-major List-3 M2P
    _M2P_ROW_CHUNK = 128
    #: max padded-lane blowup (nne * lmax / nedges) the row-major M2P
    #: map accepts; beyond it the padding costs more than the edge
    #: path's scatter-adds (measured on the chip, doc/PERF.md)
    _M2P_ROWMAJOR_MAX_WASTE = 2.0

    def _build_m2p_row_plan(self, traversal):
        """Padded (n_nonempty_rows, lmax) List-3 source-box map merged
        over all source levels (the per-source rscale is looked up per
        box, so one map suffices): contiguous writes replace the edge
        formulation's per-edge (pmax,)-potential scatter-adds.  Only
        the NONEMPTY rows are kept, and the map is skipped entirely
        when row-length skew would still pad the evaluation lanes past
        ~4x the real edge count (the edge path wins there — measured on
        the chip, doc/PERF.md)."""
        self._m2p_rowmap = None
        if np.issubdtype(np.dtype(self.dtype), np.complexfloating):
            return
        tgts, starts, lists = [], [], []
        for tgt_l, ssn in zip(
                traversal.target_boxes_sep_smaller_by_source_level,
                traversal.from_sep_smaller_by_level):
            if int(ssn.lists.shape[0]) == 0:
                continue
            tgts.append(tgt_l)
            starts.append(ssn.starts)
            lists.append(ssn.lists)
        if not lists:
            return
        ntb = int(traversal.target_boxes.shape[0])
        rows, srcs, lmax, nne = _merge_level_edges(
            tuple(tgts), tuple(starts), tuple(lists),
            self._tgt_row_of_box_arr(), ntb=ntb)
        lmax, nne = int(lmax), int(nne)                # scalar pulls
        nedges = int(rows.shape[0])
        if not 0 < lmax <= 1024:
            return
        rowmap, ne_boxes, row_of_box = _nonempty_rowmap(
            rows, srcs, traversal.target_boxes.astype(jnp.int64),
            ntb=ntb, nne=nne, lmax=lmax, nboxes=self.tree.nboxes)
        buckets, row_of_box, lanes = _bucket_rowmap(
            rowmap, ne_boxes, row_of_box, self._M2P_ROW_CHUNK)
        # gate on the BUCKETED padded lanes: the two-tier split absorbs
        # most row-length skew, so the map applies more often
        if lanes > self._M2P_ROWMAJOR_MAX_WASTE * nedges:
            return
        self._m2p_rowmap = buckets
        self._m2p_row_of_box = row_of_box

    def _eval_multipoles_rowmajor(self, mpole_exps):
        tree = self.tree
        tb = self.tgt_blocks
        bt = self._M2P_ROW_CHUNK
        d = self.dim
        ctr_t = self.centers.T                          # (nboxes, d)
        scl = None
        if self._scale_of_level is not None:
            scl = self._scale_of_level[tree.box_levels]

        # ONE wide gather per source lane: [exps | center | scale]
        # (separate narrow center/scale gathers serialize — minor dims
        # below the 128-lane width cost ~10x, doc/PERF.md r5)
        aug = [mpole_exps.astype(self.dtype),
               ctr_t.astype(self.dtype)]
        if scl is not None:
            aug.append(scl[:, None].astype(self.dtype))
        packm = jnp.concatenate(aug, axis=1)
        kk = int(mpole_exps.shape[1])
        tpts_flat = tb.points.reshape(tb.points.shape[0],
                                      tb.pmax * d)

        outs = []
        for rmap, ne_rows in self._m2p_rowmap:          # row buckets
            ntb, lmax = rmap.shape                      # ntb = nne rows
            ntb_pad = -(-ntb // bt) * bt
            rmap_p = jnp.concatenate(
                [rmap, jnp.full((ntb_pad - ntb, lmax), -1, rmap.dtype)])
            tboxes_p = jnp.concatenate(
                [ne_rows, jnp.zeros(ntb_pad - ntb, jnp.int64)])

            out = jnp.zeros((ntb_pad, tb.pmax, *self._pot_extra_dims),
                            self.dtype)

            def body(carry, i, rmap_p=rmap_p, tboxes_p=tboxes_p,
                     lmax=lmax):
                r0 = i * bt
                tbox = lax.dynamic_slice(tboxes_p, (r0,), (bt,))
                tpts = tpts_flat[tbox].reshape(bt, tb.pmax, d)
                nbr = lax.dynamic_slice(rmap_p, (r0, jnp.int64(0)),
                                        (bt, lmax))
                valid = nbr >= 0
                nb = jnp.clip(nbr, 0).astype(jnp.int64)
                sm = packm[nb]                  # (bt, lmax, K + d [+1])
                sctr = sm[..., kk:kk + d]
                exps = sm[..., :kk]
                if scl is None:
                    def per_src(tp, c, e):
                        return self._m2p_eval(tp.T - c[:, None], e)
                    vals = jax.vmap(lambda tp, cs, es: jax.vmap(
                        lambda c, e: per_src(tp, c, e))(cs, es))(
                        tpts, sctr, exps)
                else:
                    s = sm[..., kk + d]                 # (bt, lmax)

                    def per_src(tp, c, e, ss):
                        return self._m2p_eval((tp.T - c[:, None]) / ss,
                                              e, ss)
                    vals = jax.vmap(lambda tp, cs, es, ssv: jax.vmap(
                        lambda c, e, ss: per_src(tp, c, e, ss))(
                        cs, es, ssv))(tpts, sctr, exps, s)
                # vals: (bt, lmax, pm, *extra) — mask dead, sum srcs
                vmask = valid.reshape(bt, lmax,
                                      *([1] * (vals.ndim - 2)))
                vals = jnp.where(vmask, vals, 0).sum(axis=1)
                idx = (r0,) + (jnp.int64(0),) * (carry.ndim - 1)
                return lax.dynamic_update_slice(
                    carry, vals.astype(carry.dtype), idx), None

            out, _ = lax.scan(body, out,
                              jnp.arange(ntb_pad // bt, dtype=jnp.int64))
            outs.append(out)
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)

        # most target boxes have no List-3 entries: their particles
        # read zero instead of a compact row
        row = self._m2p_row_of_box[
            tree.box_id_of_target.astype(jnp.int64)].astype(jnp.int64)
        off = (jnp.arange(tree.ntargets, dtype=jnp.int64)
               - tree.box_target_starts.astype(jnp.int64)[
                   tree.box_id_of_target])
        vals = out[jnp.clip(row, 0), off]
        return jnp.where(
            (row >= 0).reshape((-1,) + (1,) * (vals.ndim - 1)),
            vals, 0)

    def eval_multipoles(self, target_boxes_by_source_level,
                        from_sep_smaller_by_level, mpole_exps):
        if (self._m2p_rowmap is not None
                and from_sep_smaller_by_level
                is self.traversal.from_sep_smaller_by_level):
            return self._eval_multipoles_rowmajor(mpole_exps)
        tgt_parts, src_parts = [], []
        for level, ssn in enumerate(from_sep_smaller_by_level):
            if ssn.count == 0:
                continue
            nedges = int(ssn.lists.shape[0])
            rows = csr_rows(ssn.starts, nedges)
            tgt_parts.append(target_boxes_by_source_level[level][rows])
            src_parts.append(ssn.lists)
        if not tgt_parts:
            return self.output_zeros()
        return self.eval_multipoles_edges(
            jnp.concatenate(tgt_parts), jnp.concatenate(src_parts),
            None, mpole_exps)

    def eval_multipoles_edges(self, tgt_e, src_e, valid_e, mpole_exps):
        """List-3 M2P over flat edges (level-agnostic: the evaluation
        only needs the source box's center); returns per-target-particle
        potentials."""
        tree = self.tree
        tb = self.tgt_blocks
        tgt_e, src_e, valid = self._sanitize_edges(tgt_e, src_e, valid_e)
        levels = self.tree.box_levels

        def edge_eval(t_box, s_box):
            rel = (tb.points[t_box].T
                   - self.centers[:, s_box][:, None])   # (d, P)
            if self._scale_of_level is None:
                return self._m2p_eval(rel, mpole_exps[s_box])
            s = self._scale_of_level[levels[s_box]]
            return self._m2p_eval(rel / s, mpole_exps[s_box], s)

        (tgts, srcs), pad_valid, nchunks = self._pad_edges(tgt_e, src_e)
        valid = jnp.pad(valid, (0, pad_valid.shape[0] - valid.shape[0])) \
            & pad_valid

        pot_box = jnp.zeros(
            (tree.nboxes + 1, tb.pmax, *self._pot_extra_dims),
            self.dtype)

        def body(carry, inp):
            pot_box = carry
            tr, sr, vv = inp
            vals = jax.vmap(edge_eval)(tr, sr)
            safe = jnp.where(vv, tr, tree.nboxes)
            return pot_box.at[safe].add(vals, mode="drop"), None

        pot_box, _ = lax.scan(
            body, pot_box,
            (tgts.reshape(nchunks, -1), srcs.reshape(nchunks, -1),
             valid.reshape(nchunks, -1)))

        return self._target_block_to_particles(pot_box[:tree.nboxes])

    # }}}

    # {{{ P2L

    #: target rows per scan trip of the row-major List-4 P2L
    _P2L_ROW_CHUNK = 128
    #: max padded-lane blowup for the row-major P2L map (the edge
    #: path's per-edge (ncoeff,) scatter-adds cost more than M2P's, so
    #: more padding is tolerable — measured, doc/PERF.md)
    _P2L_ROWMAJOR_MAX_WASTE = 8.0

    def _build_p2l_row_plan(self, traversal):
        """Padded (n_nonempty_rows, lmax) List-4 source-box map over the
        NONEMPTY target-or-target-parent rows (List 4 is sparse).  Each
        row appears once, so the local-expansion contributions come out
        as contiguous writes plus one unique scatter, instead of
        per-edge (ncoeff,) scatter-adds — formerly the FMM stage
        profile's most expensive stage (doc/PERF.md)."""
        self._p2l_rowmap = None
        if np.issubdtype(np.dtype(self.dtype), np.complexfloating):
            return
        starts = traversal.from_sep_bigger_starts
        lists = traversal.from_sep_bigger_lists
        nedges = int(lists.shape[0])
        if nedges == 0:
            return
        nr = int(traversal.target_or_target_parent_boxes.shape[0])
        lmax, nne = (int(x) for x in _csr_lmax_nne(starts))
        if not 0 < lmax <= 1024:
            return
        rows = _csr_rows_j(starts, nedges).astype(jnp.int32)
        rowmap, ne_boxes, row_of_box = _nonempty_rowmap(
            rows, lists.astype(jnp.int32),
            traversal.target_or_target_parent_boxes.astype(jnp.int64),
            ntb=nr, nne=nne, lmax=lmax, nboxes=self.tree.nboxes)
        buckets, _rob, lanes = _bucket_rowmap(
            rowmap, ne_boxes, row_of_box, self._P2L_ROW_CHUNK)
        # gate on the BUCKETED padded lanes (the split absorbs most
        # row-length skew); the eval scatters by box id, so the
        # permuted row_of_box is unused here
        if lanes > self._P2L_ROWMAJOR_MAX_WASTE * nedges:
            return
        self._p2l_rowmap = buckets

    def _form_locals_rowmajor(self, src_weights):
        tree = self.tree
        sb = self.src_blocks
        bt = self._P2L_ROW_CHUNK
        d = self.dim
        pm = sb.pmax

        q_blocks = sb.gather_values(src_weights.astype(self.dtype))
        lanes = [sb.points,
                 sb.mask.astype(sb.points.dtype)[..., None],
                 q_blocks[..., None].astype(sb.points.dtype)]
        if self.dipole_vec is not None:
            lanes.append(self._dip_blocks.astype(sb.points.dtype))
        pack = jnp.concatenate(lanes, axis=-1)
        nlane = pack.shape[-1]
        # flat gather operand — see _eval_direct_rowmajor (10x)
        pack = pack.reshape(pack.shape[0], pm * nlane)
        pack = jnp.concatenate(
            [pack, jnp.zeros((1, pm * nlane), pack.dtype)])

        ctr_t = self.centers.T                          # (nboxes, d)
        scl = None
        if self._scale_of_level is not None:
            scl = self._scale_of_level[tree.box_levels]

        loc = jnp.zeros((tree.nboxes, self.ncoeff), self.dtype)
        for rmap, ne_rows in self._p2l_rowmap:          # row buckets
            nr, lmax = rmap.shape
            nr_pad = -(-nr // bt) * bt
            rmap_p = jnp.concatenate(
                [rmap, jnp.full((nr_pad - nr, lmax), -1, rmap.dtype)])
            totp_p = jnp.concatenate(
                [ne_rows, jnp.zeros(nr_pad - nr, jnp.int64)])

            out = jnp.zeros((nr_pad, self.ncoeff), self.dtype)

            def body(carry, i, rmap_p=rmap_p, totp_p=totp_p, lmax=lmax):
                r0 = i * bt
                tbox = lax.dynamic_slice(totp_p, (r0,), (bt,))
                ctr = ctr_t[tbox]                       # (bt, d)
                nbr = lax.dynamic_slice(rmap_p, (r0, jnp.int64(0)),
                                        (bt, lmax))
                sp = pack[jnp.where(nbr >= 0, nbr,
                                    tree.nboxes).astype(jnp.int64)]
                sp = sp.reshape(bt, lmax, pm, nlane)
                spts = sp[..., :d].reshape(bt, lmax * pm, d)
                sval = sp[..., d].reshape(bt, lmax * pm) > 0
                qv = sp[..., d + 1].reshape(bt, lmax * pm).astype(
                    self.dtype)

                if self.dipole_vec is None:
                    def per_row(c, pts, sv, qq, ss):
                        rel = (pts.T - c[:, None]) / ss  # (d, lmax*pm)
                        terms = self._p2l_terms(rel, qq, ss)
                        return jnp.sum(
                            jnp.where(sv[:, None], terms, 0), axis=0)
                else:
                    dd = sp[..., d + 2:].reshape(bt, lmax * pm, d)

                    def per_row(c, pts, sv, qq, ss, dp):
                        rel = (pts.T - c[:, None]) / ss
                        _, terms = jax.jvp(
                            lambda r: self._p2l_terms(r, qq, ss),
                            (rel,), (dp.T.astype(rel.dtype) / ss,))
                        return jnp.sum(
                            jnp.where(sv[:, None], terms, 0), axis=0)

                if scl is None:
                    args = (ctr, spts, sval, qv,
                            jnp.ones(bt, spts.dtype))
                else:
                    args = (ctr, spts, sval, qv, scl[tbox])
                if self.dipole_vec is not None:
                    args = args + (dd,)
                vals = jax.vmap(per_row)(*args)         # (bt, K)
                return lax.dynamic_update_slice(
                    carry, vals.astype(carry.dtype),
                    (r0, jnp.int64(0))), None

            out, _ = lax.scan(body, out,
                              jnp.arange(nr_pad // bt, dtype=jnp.int64))

            safe = jnp.concatenate(
                [ne_rows, jnp.full(nr_pad - nr, tree.nboxes, jnp.int64)])
            loc = loc.at[safe].set(
                out, mode="drop", unique_indices=True)
        if self._coeff_mask is not None:
            loc = loc * self._coeff_mask[tree.box_levels]
        return loc

    def form_locals(self, level_start_target_or_target_parent_box_nrs,
                    target_or_target_parent_boxes, starts, lists,
                    src_weight_vecs):
        src_weights, = src_weight_vecs
        nedges = int(lists.shape[0])
        if nedges == 0:
            return self.local_expansion_zeros()
        if (self._p2l_rowmap is not None
                and starts is self.traversal.from_sep_bigger_starts):
            return self._form_locals_rowmajor(src_weights)
        rows = csr_rows(starts, nedges)
        return self.form_locals_edges(
            target_or_target_parent_boxes[rows], lists, None, src_weights)

    def form_locals_edges(self, tgt_e, src_e, valid_e, src_weights):
        """List-4 P2L over flat edges; returns local-expansion
        contributions."""
        tree = self.tree
        sb = self.src_blocks
        tgt_e, src_e, valid = self._sanitize_edges(tgt_e, src_e, valid_e)
        q_blocks = sb.gather_values(src_weights.astype(self.dtype))
        levels = self.tree.box_levels

        def tgt_scale(t_box):
            if self._scale_of_level is None:
                return 1.0       # weak-typed: no float64 promotion
            return self._scale_of_level[levels[t_box]]

        if self.dipole_vec is None:
            def edge_coeffs(t_box, s_box):
                s = tgt_scale(t_box)
                rel = (sb.points[s_box].T
                       - self.centers[:, t_box][:, None]) / s  # (d, P)
                terms = self._p2l_terms(rel, q_blocks[s_box], s)  # (P, K)
                return jnp.sum(
                    jnp.where(sb.mask[s_box][:, None], terms, 0), axis=0)
        else:
            def edge_coeffs(t_box, s_box):
                s = tgt_scale(t_box)
                rel = (sb.points[s_box].T
                       - self.centers[:, t_box][:, None]) / s  # (d, P)
                _, terms = jax.jvp(
                    lambda r: self._p2l_terms(r, q_blocks[s_box], s),
                    (rel,),
                    (self._dip_blocks[s_box].T.astype(rel.dtype) / s,))
                return jnp.sum(
                    jnp.where(sb.mask[s_box][:, None], terms, 0), axis=0)

        (tgts, srcs), pad_valid, nchunks = self._pad_edges(tgt_e, src_e)
        valid = jnp.pad(valid, (0, pad_valid.shape[0] - valid.shape[0])) \
            & pad_valid

        loc_pad = jnp.zeros((tree.nboxes + 1, self.ncoeff), self.dtype)

        def body(carry, inp):
            loc = carry
            tr, sr, vv = inp
            vals = jax.vmap(edge_coeffs)(tr, sr)
            safe = jnp.where(vv, tr, tree.nboxes)
            return loc.at[safe].add(vals, mode="drop"), None

        loc_pad, _ = lax.scan(
            body, loc_pad,
            (tgts.reshape(nchunks, -1), srcs.reshape(nchunks, -1),
             valid.reshape(nchunks, -1)))
        loc = loc_pad[:tree.nboxes]
        if self._coeff_mask is not None:
            loc = loc * self._coeff_mask[tree.box_levels]
        return loc

    # }}}

    # {{{ L2P

    def eval_locals(self, level_start_target_box_nrs, target_boxes,
                    local_exps):
        tree = self.tree
        rel = tree.targets - self.centers[:, tree.box_id_of_target]
        sarg = 1.0
        if self._scale_of_level is not None:
            sarg = self._scale_of_level[tree.box_levels[
                tree.box_id_of_target]]
            rel = rel / sarg
        return self._l2p_eval(rel, local_exps[tree.box_id_of_target],
                              scale=sarg)

    # }}}

    # {{{ local-block stage forms (distributed local trees)
    #
    # These mirror the *_edges forms but take explicit per-box particle
    # blocks instead of the tree's global ParticleBlocks — the
    # evaluation side of the reference's local trees
    # (boxtree/distributed/local_tree.py): each rank only holds the
    # blocks its edge partition touches.  Box indices marked -1 are
    # dropped.

    def _block_scale(self, gboxes):
        if self._scale_of_level is None:
            return None
        return self._scale_of_level[self.tree.box_levels[
            jnp.clip(gboxes, 0)]]

    def form_multipoles_blocks(self, gboxes, pts, pmask, q_blocks,
                               dip_blocks=None):
        """P2M from (nb, pmax, d) blocks owned by global boxes *gboxes*
        into a global-size multipole array.  *dip_blocks* (nb, pmax, d),
        if given, makes the sources dipoles (JVP of the hook, as in
        :meth:`form_multipoles`)."""
        tree = self.tree
        gb = jnp.clip(gboxes, 0).astype(jnp.int64)
        rel = (pts.transpose(2, 0, 1)
               - self.centers[:, gb][:, :, None])       # (d, nb, pmax)
        s = self._block_scale(gboxes)
        sarg = 1.0
        if s is not None:
            rel = rel / s[None, :, None]
            sarg = s[:, None]
        if dip_blocks is None:
            terms = self._p2m_terms(rel, q_blocks,
                                    scale=sarg)         # (nb, pmax, K)
        else:
            dip = dip_blocks.transpose(2, 0, 1).astype(rel.dtype)
            if s is not None:
                dip = dip / s[None, :, None]
            _, terms = jax.jvp(
                lambda r: self._p2m_terms(r, q_blocks, scale=sarg),
                (rel,), (dip,))
        keep = pmask & (gboxes >= 0)[:, None]
        terms = jnp.where(keep[..., None], terms, 0).sum(axis=1)
        if self._coeff_mask is not None:
            terms = terms * self._coeff_mask[tree.box_levels[gb]]
        mp = self.multipole_expansion_zeros()
        return mp.at[jnp.where(gboxes >= 0, gb, tree.nboxes)].add(
            terms, mode="drop")

    def _edge_block_scan(self, tgt_rows, src_rows, valid_e, edge_fn,
                         out):
        """Chunked scatter-add of per-edge block results at local target
        rows (rows < 0 dropped)."""
        valid = (tgt_rows >= 0) & (src_rows >= 0)
        if valid_e is not None:
            valid = valid & valid_e
        (tr, sr), pad_valid, nchunks = self._pad_edges(
            jnp.clip(tgt_rows, 0), jnp.clip(src_rows, 0))
        valid = jnp.pad(valid, (0, pad_valid.shape[0] - valid.shape[0])) \
            & pad_valid
        nrows = out.shape[0] - 1

        def body(carry, inp):
            acc = carry
            t, s, vv = inp
            vals = jax.vmap(edge_fn)(t, s)
            safe = jnp.where(vv, t, nrows)
            return acc.at[safe].add(vals, mode="drop"), None

        out, _ = lax.scan(
            body, out,
            (tr.reshape(nchunks, -1), sr.reshape(nchunks, -1),
             valid.reshape(nchunks, -1)))
        return out

    def eval_direct_blocks(self, tgt_rows, src_rows, valid_e,
                           tgt_pts, src_pts, src_pm, q_blocks,
                           dip_blocks=None):
        """List-1 P2P over edges indexing LOCAL blocks; returns
        (n_local_tgt_boxes + 1, pmax) block potentials."""
        if dip_blocks is None:
            def edge_potential(t, s):
                return self._p2p(tgt_pts[t], src_pts[s], src_pm[s],
                                 q_blocks[s])
        else:
            def edge_potential(t, s):
                def f(sp):
                    return self._p2p(tgt_pts[t], sp, src_pm[s],
                                     q_blocks[s])
                return jax.jvp(
                    f, (src_pts[s],),
                    (dip_blocks[s].astype(src_pts.dtype),))[1]
        out = jnp.zeros(
            (tgt_pts.shape[0] + 1, tgt_pts.shape[1],
             *self._pot_extra_dims), self.dtype)
        return self._edge_block_scan(tgt_rows, src_rows, valid_e,
                                     edge_potential, out)

    def eval_multipoles_blocks(self, tgt_rows, src_gboxes, valid_e,
                               tgt_pts, mpole_exps):
        """List-3 M2P at local target blocks from global source boxes."""
        levels = self.tree.box_levels

        def edge_eval(t, s):
            rel = tgt_pts[t].T - self.centers[:, s][:, None]
            if self._scale_of_level is None:
                return self._m2p_eval(rel, mpole_exps[s])
            sc = self._scale_of_level[levels[s]]
            return self._m2p_eval(rel / sc, mpole_exps[s], sc)

        out = jnp.zeros(
            (tgt_pts.shape[0] + 1, tgt_pts.shape[1],
             *self._pot_extra_dims), self.dtype)
        return self._edge_block_scan(tgt_rows, src_gboxes, valid_e,
                                     edge_eval, out)

    def form_locals_blocks(self, tgt_gboxes, src_rows, valid_e,
                           src_pts, src_pm, q_blocks, dip_blocks=None):
        """List-4 P2L from local source blocks into global-size local
        expansions."""
        tree = self.tree
        levels = tree.box_levels

        def edge_coeffs(t, s):
            if self._scale_of_level is None:
                sc = 1.0         # weak-typed: no float64 promotion
            else:
                sc = self._scale_of_level[levels[t]]
            rel = (src_pts[s].T - self.centers[:, t][:, None]) / sc
            if dip_blocks is None:
                terms = self._p2l_terms(rel, q_blocks[s], sc)
            else:
                _, terms = jax.jvp(
                    lambda r: self._p2l_terms(r, q_blocks[s], sc),
                    (rel,),
                    (dip_blocks[s].T.astype(rel.dtype) / sc,))
            return jnp.sum(
                jnp.where(src_pm[s][:, None], terms, 0), axis=0)

        out = jnp.zeros((tree.nboxes + 1, self.ncoeff), self.dtype)
        out = self._edge_block_scan(tgt_gboxes, src_rows, valid_e,
                                    edge_coeffs, out)
        loc = out[:tree.nboxes]
        if self._coeff_mask is not None:
            loc = loc * self._coeff_mask[tree.box_levels]
        return loc

    def eval_locals_blocks(self, gboxes, pts, pmask, local_exps):
        """L2P at (nb, pmax, d) local target blocks; returns (nb, pmax)
        block potentials."""
        gb = jnp.clip(gboxes, 0).astype(jnp.int64)
        rel = (pts.transpose(2, 0, 1)
               - self.centers[:, gb][:, :, None])       # (d, nb, pmax)
        s = self._block_scale(gboxes)
        sarg = 1.0
        if s is not None:
            rel = rel / s[None, :, None]
            sarg = s[:, None]
        vals = self._l2p_eval(rel, local_exps[gb][:, None, :],
                              scale=sarg)
        keep = pmask & (gboxes >= 0)[:, None]
        if self._pot_extra_dims:
            keep = keep[(...,) + (None,) * len(self._pot_extra_dims)]
        return jnp.where(keep, vals, 0)

    # }}}
