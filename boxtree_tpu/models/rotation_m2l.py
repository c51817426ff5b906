"""Point-and-shoot ("rotation-based") M2L for the 3D wranglers.

The counterpart of the reference's optimized M2L, which precomputes
Wigner rotation matrices keyed by rotation class and calls pyfmmlib's
rotation-accelerated translation routines
(``boxtree/pyfmmlib_integration.py:557-607``, applied ``:849-935``).
Instead of one dense (K, K) matmul per edge (O(p^4) work), each M2L
pair runs rotate -> axial translate -> rotate back (O(p^3)):

1. **rotate**: align the translation direction with +z.  Solid
   harmonics rotate block-diagonally per degree ``n`` ((2n+1) x (2n+1)
   blocks); the blocks are fit numerically per ROTATION class (the
   GCD-normalized translation directions of
   :mod:`boxtree_tpu.traversal.translation_classes` — shared across
   levels, unlike the per-(level, class) dense operators).
2. **axial translate**: with ``t = |t| z``, the dense operator's
   entries vanish except ``m_out = -m_in`` (``A_q^s(z) ∝ δ_{s0}``), so
   the translation is one (p+1-|m|)^2 block per ``m``.
3. **rotate back** with the transposed blocks.

Derivation (column convention, ``R u = z``, regular/irregular rotation
blocks ``W_A``/``W_S`` with ``A(Rx) = W_A A(x)``, ``S(Rx) = W_S
S(x)``): multipole coefficients pair against the S basis and rotate as
``M' = W_S^-T M``; local coefficients pair against ``conj(A)`` and
un-rotate as ``L = conj(W_A)^T L'``.  The resulting operator equality
``T(t) = conj(W_A)^T T(|t| z) W_S^-T`` is verified directly to 1e-15
and end-to-end by the parity test (the reference's
optimized-vs-baseline equality, ``test/test_fmm.py:726-794``).  Note
the two bases rotate with DIFFERENT blocks (their m-dependent
normalizations differ); using ``W_A`` on both sides looks plausible
and is wrong by O(1).

On device every stage is a grouped matmul over the operator-sorted edge
runs of the :class:`~boxtree_tpu.models.particle_blocks.M2LPlan`, so
the full M2L is (p+1) + (2p+1) + (p+1) grouped matmuls of small blocks
versus the dense path's ONE grouped matmul of (K, K) blocks — fewer
FLOPs, more (and skinnier) MXU launches.  Which wins on TPU is measured
in ``examples/tpu_m2l_bench.py`` and recorded in doc/PERF.md.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from boxtree_tpu.models.particle_blocks import grouped_matmul
from boxtree_tpu.ops import solid_harmonics as sh


def _rotation_to_z(u):
    """3x3 rotation R with R u = z (u a unit vector)."""
    z = np.array([0.0, 0.0, 1.0])
    c = float(u @ z)
    if c > 1 - 1e-12:
        return np.eye(3)
    if c < -1 + 1e-12:
        return np.diag([1.0, -1.0, -1.0])     # 180 deg about x
    axis = np.cross(u, z)
    s = np.linalg.norm(axis)
    axis = axis / s
    kx = np.array([[0, -axis[2], axis[1]],
                   [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    return np.eye(3) + s * kx + (1 - c) * (kx @ kx)


def _fit_rotation_blocks(R, p, sample, basis=None):
    """Per-degree blocks W_n with ``B_n(R x) = W_n B_n(x)`` for basis
    ``B`` (default the regular A basis of
    :mod:`boxtree_tpu.ops.solid_harmonics`; pass ``sh.irregular`` for
    the S basis, whose (n-|m|)!-normalization rotates with DIFFERENT
    blocks), fit by least squares on a fixed unit-vector sample
    (rotations act only on the angular part, so the fit at |x| = 1
    determines the block)."""
    basis = basis or sh.regular
    a_x = basis(sample, p)                    # (S, K)
    a_rx = basis(R @ sample, p)
    blocks = []
    for n in range(p + 1):
        sl = slice(n * n, (n + 1) * (n + 1))
        wt, *_ = np.linalg.lstsq(a_x[:, sl], a_rx[:, sl], rcond=None)
        blocks.append(wt.T)                   # W_n (column convention)
    return blocks


class RotationM2L:
    """Precomputed point-and-shoot M2L apply for a 3D wrangler.

    :arg wrangler: an ``ExpansionWranglerBase`` 3D subclass whose
        coefficients are packed ``(n, m) -> n^2 + n + m`` (Laplace 3D /
        Helmholtz 3D) and whose ``_m2l_matrix(t, r)`` builds the dense
        host operator (used here only at AXIAL translations).
    """

    def __init__(self, wrangler):
        plan = wrangler.m2l_plan
        p = wrangler.order
        self.order = p
        self.dtype = wrangler.dtype
        # real-pair wranglers ([re | im] coefficients, see
        # Laplace3DPairsExpansionWrangler): every block is pair-expanded
        # and column slices span both halves
        self.pairs = not np.issubdtype(np.dtype(wrangler.dtype),
                                       np.complexfloating)
        self._kc = (p + 1) * (p + 1)        # complex coefficient count
        tree = wrangler.tree
        root = float(np.asarray(tree.root_extent))

        def r_of(lev):
            return (1.0 if wrangler._rscale_np is None
                    else float(wrangler._rscale_np[lev]))

        # rotation classes: GCD-normalized integer directions
        rc_of_op = np.zeros(plan.nops, np.int64)
        dirs = {}
        ts = []
        for opi, (lev, c) in enumerate(plan.used):
            v = plan.offsets[c].astype(np.int64)
            g = math.gcd(math.gcd(abs(int(v[0])), abs(int(v[1]))),
                         abs(int(v[2])))
            key = tuple(v // max(g, 1))
            rc_of_op[opi] = dirs.setdefault(key, len(dirs))
            ts.append(v.astype(np.float64) * (root / (1 << lev)))
        self.nrotations = len(dirs)

        rng = np.random.default_rng(42)
        sample = rng.standard_normal((3, 2 * p + 7))
        sample /= np.linalg.norm(sample, axis=0)

        # per-degree rotation blocks per rotation class.  The verified
        # identity (tested to 1e-15 in tests/test_laplace.py) is
        #   T(t) = conj(W_A)^T  T(|t| z)  W_S^{-T}
        # (multipole coefficients pair against the S basis and rotate
        # with its blocks; local coefficients pair against conj(A)),
        # so the row-vector pipeline is
        #   L_row = ((M_row @ W_S^{-1}) @ Tax^T) @ conj(W_A).
        w_rc, winv_rc = [], []
        for key in dirs:                      # insertion order = rc id
            u = np.asarray(key, np.float64)
            u /= np.linalg.norm(u)
            rz = _rotation_to_z(u)
            wa = _fit_rotation_blocks(rz, p, sample)
            ws = _fit_rotation_blocks(rz, p, sample, basis=sh.irregular)
            w_rc.append([np.conj(b) for b in wa])      # unrotate ops
            winv_rc.append([np.linalg.inv(b) for b in ws])  # rotate ops

        # per-op gathered stacks (duplicated per level — small blocks);
        # in pairs mode each complex block B becomes the real
        # [[Br, -Bi], [Bi, Br]] acting on [re | im] column pairs, and
        # the column index set of degree n spans both halves
        cdt = self.dtype

        def as_op(stack):
            if self.pairs:
                from boxtree_tpu.ops.solid_harmonics import pair_matrix
                # stored blocks RIGHT-multiply [re | im] row vectors:
                # z_row @ A needs [[Ar, Ai], [-Ai, Ar]], which is
                # pair_matrix(conj(A)) (pair_matrix is the column
                # convention)
                stack = pair_matrix(np.conj(stack))
            return jnp.asarray(stack.astype(cdt))

        def col_idx(ix):
            ix = np.asarray(ix)
            if self.pairs:
                ix = np.concatenate([ix, self._kc + ix])
            return jnp.asarray(ix)

        self._deg_idx = [col_idx(np.arange(n * n, (n + 1) * (n + 1)))
                         for n in range(p + 1)]
        self._rot_ops = []                    # rotate:   M'r = Mr @ W^-1
        self._unrot_ops = []                  # unrotate: Lr = L'r @ W
        for n in range(p + 1):
            self._rot_ops.append(as_op(np.stack(
                [winv_rc[rc][n] for rc in rc_of_op])))
            self._unrot_ops.append(as_op(np.stack(
                [w_rc[rc][n] for rc in rc_of_op])))

        # axial blocks, from the wrangler's own host operator at |t| z
        t_ax = np.stack([[0.0, 0.0, float(np.linalg.norm(t))]
                         for t in ts])
        rs = np.array([r_of(lev) for (lev, _c) in plan.used])
        dense_ax = np.asarray(getattr(
            wrangler, "_m2l_matrices_complex",
            wrangler._m2l_matrices)(t_ax, rs))          # nops x (K, K)
        nm_n = np.concatenate(
            [[n] * (2 * n + 1) for n in range(p + 1)]).astype(np.int64)
        nm_m = np.concatenate(
            [np.arange(-n, n + 1) for n in range(p + 1)])
        self._ax_ops = []
        self._ax_src_idx = []
        self._ax_dst_idx = []
        offpat = 0.0
        for m in range(-p, p + 1):
            rows = np.nonzero(nm_m == m)[0]             # (n, m), n>=|m|
            cols = np.nonzero(nm_m == -m)[0]            # (n', -m)
            blocks = np.stack([ax[np.ix_(rows, cols)]
                               for ax in dense_ax])
            # everything outside the delta pattern must be numerically 0
            for ax in dense_ax[:2]:
                mask = np.ones_like(ax, bool)
                mask[np.ix_(rows, cols)] = False
                keep = np.abs(nm_m[:, None] + nm_m[None, :]) == 0
                offpat = max(offpat, np.abs(
                    np.where(keep, 0, ax)).max()
                    / max(np.abs(ax).max(), 1e-300))
            # row convention: l'_row = m'_row @ block^T
            self._ax_ops.append(as_op(blocks.transpose(0, 2, 1)))
            self._ax_src_idx.append(col_idx(cols))
            self._ax_dst_idx.append(col_idx(rows))
        if offpat > 1e-10:
            raise AssertionError(
                f"axial M2L operator not delta-sparse: {offpat}")

    def apply(self, mp_rows, group_sizes):
        """(E, K) operator-sorted multipole rows -> (E, K) local rows
        (rotate / axial / unrotate, each as grouped matmuls).  In pairs
        mode K = 2 * (p+1)^2 and every index set / block is
        pair-expanded; the arithmetic is otherwise identical."""
        p = self.order
        k = mp_rows.shape[1]

        def stage(rows_in, ops_by_deg, idx_by_deg):
            out = jnp.zeros((mp_rows.shape[0], k), self.dtype)
            for ix, ops in zip(idx_by_deg, ops_by_deg):
                y = grouped_matmul(rows_in[:, ix], ops, group_sizes)
                out = out.at[:, ix].set(y)
            return out

        mrot = stage(mp_rows, self._rot_ops, self._deg_idx)

        out = jnp.zeros((mp_rows.shape[0], k), self.dtype)
        for i in range(2 * p + 1):
            sl = mrot[:, self._ax_src_idx[i]]
            y = grouped_matmul(sl, self._ax_ops[i], group_sizes)
            out = out.at[:, self._ax_dst_idx[i]].set(y)

        return stage(out, self._unrot_ops, self._deg_idx)
