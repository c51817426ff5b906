"""Native Laplace expansion wranglers (2D complex series, 3D solid
harmonics).

TPU-native replacement for the reference's pyfmmlib (Fortran) backend
(``boxtree/pyfmmlib_integration.py:276-1162``):

- 2D: kernel ``G(t, s) = log(t - s)`` (complex); multipole
  ``a_0 log w + sum a_k w^-k``, local ``sum b_l w^l``.
- 3D: kernel ``G(t, s) = 1/|t - s|``; scaled solid harmonics
  (:mod:`boxtree_tpu.ops.solid_harmonics`), in which every translation is
  a plain spherical convolution:

  - ``M_n^m = sum_j q_j conj(R_n^m(y_j - c))``;
    ``phi(x) = sum M_n^m S_n^m(x - c)``
  - M2M (center shift by ``t`` = new - old):
    ``M'_a = sum_b conj(R_{a-b}(-t)) M_b``
  - M2L (``t`` = c_tgt - c_src):
    ``L_a = (-1)^{n_a} sum_b S_{a+b}(t) M_b``
  - L2L (``t`` = new - old): ``L'_a = sum_b conj(R_{b-a}(t)) L_b``
  - local eval: ``phi(x) = sum L_n^m conj(R_n^m(x - c))``

  (each identity unit-tested to machine precision against direct
  evaluation, tests/test_laplace.py).

Dense operators are precomputed on the host per (level, child digit) for
M2M/L2L and per translation class for M2L (the analogue of
``boxtree/translation_classes.py``), turning the hot M2L stage into a few
dense matmuls per level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxtree_tpu.fmm.drive import TreeIndependentDataForWrangler
from boxtree_tpu.models.expansion_base import ExpansionWranglerBase
from boxtree_tpu.ops import solid_harmonics as sh


def _binom_table(p):
    c = np.zeros((2 * p + 2, 2 * p + 2))
    c[:, 0] = 1
    for i in range(1, 2 * p + 2):
        for j in range(1, i + 1):
            c[i, j] = c[i - 1, j - 1] + c[i - 1, j]
    return c


class LaplaceTreeIndependentDataForWrangler(TreeIndependentDataForWrangler):
    """Expansion order + cached combinatorial tables."""

    def __init__(self, dim, order):
        self.dim = dim
        self.order = order
        self.binom = _binom_table(order)
        if dim == 3:
            p = order
            self.nm_n = np.concatenate(
                [[n] * (2 * n + 1) for n in range(p + 1)]).astype(np.int64)
            self.nm_m = np.concatenate(
                [np.arange(-n, n + 1) for n in range(p + 1)])


# {{{ 2D

class Laplace2DExpansionWrangler(ExpansionWranglerBase):
    """2D Laplace FMM wrangler (complex power series).

    Supports dipole sources: with ``dipole_vec`` the source potential is
    ``w * (d . grad_y) log(z_x - z_y) = dipstr / (z_x - z_y)`` with
    ``dipstr = -w (d_x + i d_y)`` — the reference's 2D convention
    (``boxtree/pyfmmlib_integration.py:501-506``).
    """

    dtype = np.complex128
    _supports_rscale = True

    def __init__(self, tree_indep, traversal, **kwargs):
        self.order = tree_indep.order
        super().__init__(tree_indep, traversal, **kwargs)

    def _ncoeff(self):
        return self.order + 1

    def _coeff_orders(self):
        return np.arange(self.order + 1)

    # {{{ host operators (complex translation z)

    def _m2m_host(self, t):
        """a'_l = sum_k A[l,k] a_k for center shift z_old - z_new = t."""
        p, binom = self.order, self.tree_indep.binom
        a = np.zeros((p + 1, p + 1), np.complex128)
        a[0, 0] = 1.0
        tp = t ** np.arange(p + 1)
        for ell in range(1, p + 1):
            a[ell, 0] = -tp[ell] / ell
            for k in range(1, ell + 1):
                a[ell, k] = binom[ell - 1, k - 1] * tp[ell - k]
        return a

    def _m2l_host(self, z0):
        """b_l = sum_k B[l,k] a_k, z0 = c_src - c_tgt."""
        p, binom = self.order, self.tree_indep.binom
        b = np.zeros((p + 1, p + 1), np.complex128)
        zpow = (1.0 / z0) ** np.arange(2 * p + 2)
        b[0, 0] = np.log(-z0)
        for ell in range(1, p + 1):
            b[ell, 0] = -zpow[ell] / ell
        for ell in range(p + 1):
            for k in range(1, p + 1):
                b[ell, k] = ((-1.0) ** k) * binom[ell + k - 1, ell] \
                    * zpow[ell + k]
        return b

    def _l2l_host(self, t):
        """b'_l = sum_k B[l,k] b_k for center shift z_old - z_new = t."""
        p, binom = self.order, self.tree_indep.binom
        b = np.zeros((p + 1, p + 1), np.complex128)
        tp = (-t) ** np.arange(p + 1)
        for ell in range(p + 1):
            for k in range(ell, p + 1):
                b[ell, k] = binom[k, ell] * tp[k - ell]
        return b

    @staticmethod
    def _z(t):
        return complex(t[0], t[1])

    # rscaled operators: coefficients are stored as a~_k = a_k / r^k
    # (b~_l = b_l r^l), which keeps every entry O(1) on deep trees; the
    # log-kernel a_0 row needs an explicit + log(r) correction
    # (the role of pyfmmlib's rscale arguments,
    # boxtree/pyfmmlib_integration.py:393-402).

    def _m2m_matrix(self, t, r_child=1.0, r_parent=1.0):
        # base convention: t = new - old
        a = self._m2m_host(-self._z(t) / r_parent)
        if r_child != r_parent:
            a = a * (r_child / r_parent) ** np.arange(
                self.order + 1)[None, :]
        return a

    def _l2l_matrix(self, t, r_parent=1.0, r_child=1.0):
        b = self._l2l_host(-self._z(t) / r_parent)
        if r_child != r_parent:
            b = b * ((r_child / r_parent) ** np.arange(
                self.order + 1))[:, None]
        return b

    def _m2l_matrix(self, t, r=1.0):
        # base convention: t = c_tgt - c_src
        m = self._m2l_host(-self._z(t) / r)
        if r != 1.0:
            m[0, 0] += np.log(r)
        return m

    def _m2l_ops_device(self, ts, rs):
        """Vectorized `_m2l_host` over all operators in jnp (the table
        never leaves the device; see
        ``ExpansionWranglerBase._m2l_ops_device``)."""
        # dtype discipline: every constant matches the dtype of *ts*
        # (the caller feeds float32 for complex64 wranglers; an f64
        # constant would promote to complex128, whose f64->c128 convert
        # the TPU X64 rewriter rejects outright)
        rdt = ts.dtype
        p, binom = self.order, self.tree_indep.binom
        z0 = -(ts[:, 0] + 1j * ts[:, 1]) / rs           # (nops,)
        e = np.arange(2 * p + 2)
        zpow = (1.0 / z0)[:, None] ** jnp.asarray(e, rdt)
        # k >= 1 entries: b[l,k] = (-1)^k binom[l+k-1, l] z0^-(l+k)
        ell = np.arange(p + 1)
        coef = np.zeros((p + 1, p + 1))
        for k in range(1, p + 1):
            coef[:, k] = ((-1.0) ** k) * binom[ell + k - 1, ell]
        lk = ell[:, None] + ell[None, :]
        b = jnp.asarray(coef, rdt)[None] * zpow[:, jnp.asarray(lk)]
        # column 0: l=0 -> log(-z0) + log(r); l>=1 -> -z0^-l / l
        col0 = jnp.concatenate(
            [(jnp.log(-z0) + jnp.log(rs))[:, None],
             -zpow[:, 1:p + 1] / jnp.asarray(ell[1:], rdt)],
            axis=1)
        return jnp.concatenate([col0[:, :, None], b[:, :, 1:]], axis=2)

    # }}}

    # {{{ device hooks

    def _p2m_terms(self, rel, q, scale=1.0):
        zeta = rel[0] + 1j * rel[1]
        qc = q.astype(self.dtype)
        coeffs = [qc]
        zp = jnp.ones_like(zeta)
        for k in range(1, self.ncoeff):
            zp = zp * zeta
            coeffs.append(-qc * zp / k)
        return jnp.stack(coeffs, axis=-1)

    def _l2p_eval(self, rel, loc, scale=1.0):
        w = rel[0] + 1j * rel[1]
        acc = loc[..., 0]
        wp = jnp.ones_like(w)
        for ell in range(1, self.ncoeff):
            wp = wp * w
            acc = acc + loc[..., ell] * wp
        return acc

    def _m2p_eval(self, rel, mp, scale=1.0):
        w = rel[0] + 1j * rel[1]
        ws = jnp.where(w == 0, 1.0, w)
        winv = 1.0 / ws
        acc = mp[0] * (jnp.log(ws) + jnp.log(scale))
        wp = jnp.ones_like(w)
        for k in range(1, self.ncoeff):
            wp = wp * winv
            acc = acc + mp[k] * wp
        return acc

    def _p2l_terms(self, rel, q, scale=1.0):
        z0 = rel[0] + 1j * rel[1]
        z0s = jnp.where(z0 == 0, 1.0, z0)
        z0inv = 1.0 / z0s
        coeffs = [q * (jnp.log(-z0s) + jnp.log(scale))]
        zp = jnp.ones_like(z0)
        for ell in range(1, self.ncoeff):
            zp = zp * z0inv
            coeffs.append(-q * zp / ell)
        return jnp.stack(coeffs, axis=-1)

    def _p2p(self, tgt_pts, src_pts, src_valid, q):
        dx = tgt_pts[:, None, 0] - src_pts[None, :, 0]
        dy = tgt_pts[:, None, 1] - src_pts[None, :, 1]
        r2 = dx * dx + dy * dy
        g = 0.5 * jnp.log(jnp.where(r2 > 0, r2, 1.0))
        g = jnp.where((r2 > 0) & src_valid[None, :], g, 0.0)
        return g.astype(self.dtype) @ q

    # }}}


class Laplace2DPairsExpansionWrangler(Laplace2DExpansionWrangler):
    """Complex-free 2D Laplace wrangler: ``[re | im]`` real-pair
    coefficients (see :class:`Laplace3DPairsExpansionWrangler` for the
    rationale — the tunneled TPU backend supports no complex op at
    all).  Potentials are computed directly as their real part."""

    dtype = np.float64

    def _ncoeff(self):
        return 2 * (self.order + 1)

    def _coeff_orders(self):
        return np.tile(np.arange(self.order + 1), 2)

    # {{{ host operators (complex builders, pair-expanded)

    def _m2m_matrix(self, *a, **k):
        return sh.pair_matrix(
            Laplace2DExpansionWrangler._m2m_matrix(self, *a, **k))

    def _l2l_matrix(self, *a, **k):
        return sh.pair_matrix(
            Laplace2DExpansionWrangler._l2l_matrix(self, *a, **k))

    def _m2l_matrix(self, *a, **k):
        return sh.pair_matrix(
            Laplace2DExpansionWrangler._m2l_matrix(self, *a, **k))

    def _m2l_ops_device(self, ts, rs):
        """Pair-lane port of the complex ``_m2l_ops_device``: all
        complex scalars carried as explicit (re, im) real lanes."""
        rdt = ts.dtype
        p, binom = self.order, self.tree_indep.binom
        # z0 = -(tx + i ty) / rs
        x0, y0 = -ts[:, 0] / rs, -ts[:, 1] / rs
        n2 = x0 * x0 + y0 * y0
        ixr, ixi = x0 / n2, -y0 / n2                    # 1 / z0
        # zpow[e] = (1/z0)^e, e = 0 .. 2p+1
        zpr, zpi = [jnp.ones_like(x0)], [jnp.zeros_like(x0)]
        for _e in range(1, 2 * p + 2):
            pr, pi = zpr[-1], zpi[-1]
            zpr.append(pr * ixr - pi * ixi)
            zpi.append(pr * ixi + pi * ixr)
        zpr = jnp.stack(zpr, axis=1)                    # (nops, 2p+2)
        zpi = jnp.stack(zpi, axis=1)

        ell = np.arange(p + 1)
        coef = np.zeros((p + 1, p + 1))
        for k in range(1, p + 1):
            coef[:, k] = ((-1.0) ** k) * binom[ell + k - 1, ell]
        lk = jnp.asarray(ell[:, None] + ell[None, :])
        coef = jnp.asarray(coef, rdt)
        br = coef[None] * zpr[:, lk]
        bi = coef[None] * zpi[:, lk]

        # column 0: l=0 -> log(-z0) + log(r); l>=1 -> -z0^-l / l
        # -z0 = (tx + i ty) / rs
        lr = 0.5 * jnp.log((ts[:, 0] ** 2 + ts[:, 1] ** 2) / rs ** 2) \
            + jnp.log(rs)
        li = jnp.arctan2(ts[:, 1], ts[:, 0])
        linv = jnp.asarray(1.0 / ell[1:], rdt)
        col0r = jnp.concatenate(
            [lr[:, None], -zpr[:, 1:p + 1] * linv], axis=1)
        col0i = jnp.concatenate(
            [li[:, None], -zpi[:, 1:p + 1] * linv], axis=1)
        tr = jnp.concatenate([col0r[:, :, None], br[:, :, 1:]], axis=2)
        tim = jnp.concatenate([col0i[:, :, None], bi[:, :, 1:]], axis=2)
        top = jnp.concatenate([tr, -tim], axis=-1)
        bot = jnp.concatenate([tim, tr], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    # }}}

    # {{{ device hooks (pair lanes)

    def _p2m_terms(self, rel, q, scale=1.0):
        zr, zi = rel[0], rel[1]
        qr = q.astype(self.dtype)
        re, im = [qr], [jnp.zeros_like(qr)]
        pr, pi = jnp.ones_like(zr), jnp.zeros_like(zr)
        for k in range(1, self.order + 1):
            pr, pi = pr * zr - pi * zi, pr * zi + pi * zr
            re.append(-qr * pr / k)
            im.append(-qr * pi / k)
        return jnp.stack(re + im, axis=-1)

    def _l2p_eval(self, rel, loc, scale=1.0):
        # Re(sum_l loc_l w^l)
        wr, wi = rel[0], rel[1]
        nc = self.order + 1
        acc = loc[..., 0]
        pr, pi = jnp.ones_like(wr), jnp.zeros_like(wr)
        for ell in range(1, nc):
            pr, pi = pr * wr - pi * wi, pr * wi + pi * wr
            acc = acc + loc[..., ell] * pr - loc[..., nc + ell] * pi
        return acc

    def _m2p_eval(self, rel, mp, scale=1.0):
        # Re(mp_0 (log w + log scale) + sum_k mp_k w^-k)
        wr, wi = rel[0], rel[1]
        nc = self.order + 1
        r2 = wr * wr + wi * wi
        r2s = jnp.where(r2 == 0, 1.0, r2)
        lgr = 0.5 * jnp.log(r2s) + jnp.log(scale)
        th = jnp.arctan2(wi, jnp.where(r2 == 0, 1.0, wr))
        acc = mp[0] * lgr - mp[nc] * th
        ixr, ixi = wr / r2s, -wi / r2s                  # 1 / w
        pr, pi = jnp.ones_like(wr), jnp.zeros_like(wr)
        for k in range(1, nc):
            pr, pi = pr * ixr - pi * ixi, pr * ixi + pi * ixr
            acc = acc + mp[k] * pr - mp[nc + k] * pi
        return acc

    def _p2l_terms(self, rel, q, scale=1.0):
        # coeff_0 = q (log(-z0) + log scale); coeff_l = -q z0^-l / l
        zr, zi = rel[0], rel[1]
        r2 = zr * zr + zi * zi
        r2s = jnp.where(r2 == 0, 1.0, r2)
        lgr = 0.5 * jnp.log(r2s) + jnp.log(scale)
        th = jnp.arctan2(-zi, jnp.where(r2 == 0, 1.0, -zr))
        re, im = [q * lgr], [q * th]
        ixr, ixi = zr / r2s, -zi / r2s                  # 1 / z0
        pr, pi = jnp.ones_like(zr), jnp.zeros_like(zr)
        for ell in range(1, self.order + 1):
            pr, pi = pr * ixr - pi * ixi, pr * ixi + pi * ixr
            re.append(-q * pr / ell)
            im.append(-q * pi / ell)
        return jnp.stack(re + im, axis=-1)

    # }}}

# }}}


# {{{ 3D

class Laplace3DExpansionWrangler(ExpansionWranglerBase):
    """3D Laplace FMM wrangler (solid harmonics); see module docstring."""

    dtype = np.complex128
    _supports_rscale = True

    def __init__(self, tree_indep, traversal, **kwargs):
        self.order = tree_indep.order
        super().__init__(tree_indep, traversal, **kwargs)

    def _ncoeff(self):
        return sh.ncoeffs(self.order)

    def _coeff_orders(self):
        return self.tree_indep.nm_n

    # {{{ host operators
    #
    # rscaled coefficients: M~_n = M_n / r^n, L~_n = L_n r^n — every
    # translation argument is divided by the participating rscale, with
    # diagonal (r_child/r_parent)^n column/row corrections (the solid
    # harmonics are homogeneous, so scaling is exact).

    def _m2m_matrix(self, t, r_child=1.0, r_parent=1.0):
        p = self.order
        ti = self.tree_indep
        rb = np.conj(sh.regular(
            -np.asarray(t)[:, None] / r_parent, p)[0])
        j = ti.nm_n[:, None] - ti.nm_n[None, :]
        k = ti.nm_m[:, None] - ti.nm_m[None, :]
        valid = (j >= 0) & (np.abs(k) <= j)
        jj = np.where(valid, j, 0)
        kk = np.where(valid, k, 0)
        mat = np.where(valid, rb[jj * jj + jj + kk], 0)
        if r_child != r_parent:
            mat = mat * (r_child / r_parent) ** ti.nm_n[None, :]
        return mat

    def _l2l_matrix(self, t, r_parent=1.0, r_child=1.0):
        p = self.order
        ti = self.tree_indep
        rb = np.conj(sh.regular(
            np.asarray(t)[:, None] / r_parent, p)[0])
        j = ti.nm_n[None, :] - ti.nm_n[:, None]
        k = ti.nm_m[None, :] - ti.nm_m[:, None]
        valid = (j >= 0) & (np.abs(k) <= j)
        jj = np.where(valid, j, 0)
        kk = np.where(valid, k, 0)
        mat = np.where(valid, rb[jj * jj + jj + kk], 0)
        if r_child != r_parent:
            mat = mat * ((r_child / r_parent) ** ti.nm_n)[:, None]
        return mat

    def _m2l_matrix(self, t, r=1.0):
        return self._m2l_matrices(np.asarray(t)[None], [r])[0]

    def _m2l_matrices(self, ts, rs):
        """Batched: ONE solid-harmonics evaluation over all (nops,)
        translations (the per-matrix python loop costs ~1 ms each)."""
        ti = self.tree_indep
        ts = np.asarray(ts, np.float64)
        rs = np.asarray(rs, np.float64)
        sb = sh.irregular(ts.T / rs[None, :], 2 * self.order)
        # sb: (nops, ncoeff(2p)); per-op operator via shared index map
        n_sum = ti.nm_n[:, None] + ti.nm_n[None, :]
        m_sum = ti.nm_m[:, None] + ti.nm_m[None, :]
        sign = (-1.0) ** ti.nm_n[:, None]
        idx = n_sum * n_sum + n_sum + m_sum
        return sign[None] * sb[:, idx] / rs[:, None, None]

    def _m2l_ops_device(self, ts, rs):
        """Same construction as `_m2l_matrices` in jnp: evaluate the
        order-2p irregular basis at the (nops,) translations (~(nops,
        (2p+1)^2) values) and expand to (nops, K, K) via a static index
        map — the dense table never leaves the device."""
        ti = self.tree_indep
        sb = sh.irregular(ts.T / rs[None, :], 2 * self.order, xp=jnp)
        n_sum = ti.nm_n[:, None] + ti.nm_n[None, :]
        m_sum = ti.nm_m[:, None] + ti.nm_m[None, :]
        # sign in ts's (real) dtype: an f64 constant would promote the
        # complex64 basis to complex128 (TPU X64-rewrite killer)
        sign = jnp.asarray((-1.0) ** ti.nm_n[:, None], ts.dtype)
        idx = jnp.asarray(n_sum * n_sum + n_sum + m_sum)
        return sign[None] * sb[:, idx] / rs[:, None, None]

    # }}}

    # {{{ device hooks

    @staticmethod
    def _safe(rel):
        r2 = (rel * rel).sum(axis=0)
        return jnp.where(r2 > 0, rel, 1.0), r2 > 0

    def _p2m_terms(self, rel, q, scale=1.0):
        r = sh.regular(rel, self.order, xp=jnp)
        return jnp.conj(r) * q.astype(self.dtype)[..., None]

    def _l2p_eval(self, rel, loc, scale=1.0):
        r = sh.regular(rel, self.order, xp=jnp)
        return jnp.sum(jnp.conj(r) * loc, axis=-1)

    def _m2p_eval(self, rel, mp, scale=1.0):
        rel_s, ok = self._safe(rel)
        s = sh.irregular(rel_s, self.order, xp=jnp)
        return jnp.where(ok, jnp.sum(s * mp, axis=-1), 0) / scale

    def _p2l_terms(self, rel, q, scale=1.0):
        rel_s, ok = self._safe(rel)
        s = sh.irregular(rel_s, self.order, xp=jnp)
        return jnp.where(ok[..., None],
                         s * q.astype(self.dtype)[..., None], 0) / scale

    def _p2p(self, tgt_pts, src_pts, src_valid, q):
        diff = tgt_pts[:, None, :] - src_pts[None, :, :]
        r2 = (diff * diff).sum(-1)
        g = jnp.where((r2 > 0) & src_valid[None, :],
                      1.0 / jnp.sqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
        return g.astype(self.dtype) @ q

    # }}}


class Laplace3DPairsExpansionWrangler(Laplace3DExpansionWrangler):
    """Complex-free 3D Laplace wrangler: ``[re | im]`` real-pair
    coefficients and 2x2-expanded real translation operators.

    Mathematically identical to :class:`Laplace3DExpansionWrangler`
    (equality-tested to ~1e-12), but every device op is real:

    - the TPU MXU has no complex path — XLA lowers complex matmuls to
      real ones anyway, and the tunneled TPU backend rejects *every*
      complex op as UNIMPLEMENTED, so real pairs are the only
      representation that runs there at all;
    - potentials are computed directly as their real part (the Laplace
      potential is real; the complex machinery's imaginary parts only
      ever cancel), saving half the P2P/M2P/L2P work.

    The generic stage machinery (:class:`ExpansionWranglerBase`) is
    reused untouched: ``ncoeff`` doubles, host operator hooks return
    ``pair_matrix``-expanded real matrices, and the particle hooks
    evaluate the basis with :func:`~boxtree_tpu.ops.solid_harmonics.
    regular_pairs` / ``irregular_pairs``.  Counterpart of the
    reference's real-valued Fortran storage of complex expansions
    (``boxtree/pyfmmlib_integration.py:414-440`` stores (2, ...) real
    views).
    """

    dtype = np.float64

    #: the complex (K, K) operator builder, for consumers that expand
    #: blocks themselves (RotationM2L extracts axial sub-blocks)
    _m2l_matrices_complex = Laplace3DExpansionWrangler._m2l_matrices

    def reorder_sources(self, a):
        if jnp.iscomplexobj(a):
            raise TypeError(
                "the real-pair wrangler takes REAL source weights; "
                "complex weights are linear — drive the re/im parts "
                "separately and combine")
        return super().reorder_sources(a)

    def _ncoeff(self):
        return 2 * sh.ncoeffs(self.order)

    def _coeff_orders(self):
        return np.tile(self.tree_indep.nm_n, 2)

    # {{{ host operators (complex builders, pair-expanded)

    def _m2m_matrix(self, *a, **k):
        return sh.pair_matrix(
            Laplace3DExpansionWrangler._m2m_matrix(self, *a, **k))

    def _l2l_matrix(self, *a, **k):
        return sh.pair_matrix(
            Laplace3DExpansionWrangler._l2l_matrix(self, *a, **k))

    def _m2l_matrices(self, ts, rs):
        return sh.pair_matrix(
            Laplace3DExpansionWrangler._m2l_matrices(self, ts, rs))

    def _m2l_ops_device(self, ts, rs):
        ti = self.tree_indep
        sb = sh.irregular_pairs(ts.T / rs[None, :], 2 * self.order,
                                xp=jnp)
        k2 = sh.ncoeffs(2 * self.order)
        sbr, sbi = sb[:, :k2], sb[:, k2:]
        n_sum = ti.nm_n[:, None] + ti.nm_n[None, :]
        m_sum = ti.nm_m[:, None] + ti.nm_m[None, :]
        sign = jnp.asarray((-1.0) ** ti.nm_n[:, None], ts.dtype)
        idx = jnp.asarray(n_sum * n_sum + n_sum + m_sum)
        tr = sign[None] * sbr[:, idx] / rs[:, None, None]
        tim = sign[None] * sbi[:, idx] / rs[:, None, None]
        top = jnp.concatenate([tr, -tim], axis=-1)
        bot = jnp.concatenate([tim, tr], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    # }}}

    # {{{ device hooks (real-pair basis)

    def _p2m_terms(self, rel, q, scale=1.0):
        # conj(R) * q  ->  [Rr | -Ri] * q
        rp = sh.regular_pairs(rel, self.order, xp=jnp)
        k = sh.ncoeffs(self.order)
        conj = jnp.concatenate([rp[..., :k], -rp[..., k:]], axis=-1)
        return conj * q.astype(self.dtype)[..., None]

    def _l2p_eval(self, rel, loc, scale=1.0):
        # Re(sum conj(R) * loc) = Rr.lr + Ri.li
        rp = sh.regular_pairs(rel, self.order, xp=jnp)
        k = sh.ncoeffs(self.order)
        return jnp.sum(rp[..., :k] * loc[..., :k]
                       + rp[..., k:] * loc[..., k:], axis=-1)

    def _m2p_eval(self, rel, mp, scale=1.0):
        # Re(sum S * mp) = Sr.mr - Si.mi
        rel_s, ok = self._safe(rel)
        sp = sh.irregular_pairs(rel_s, self.order, xp=jnp)
        k = sh.ncoeffs(self.order)
        val = jnp.sum(sp[..., :k] * mp[..., :k]
                      - sp[..., k:] * mp[..., k:], axis=-1)
        return jnp.where(ok, val, 0) / scale

    def _p2l_terms(self, rel, q, scale=1.0):
        rel_s, ok = self._safe(rel)
        sp = sh.irregular_pairs(rel_s, self.order, xp=jnp)
        return jnp.where(ok[..., None],
                         sp * q.astype(self.dtype)[..., None], 0) / scale

    # }}}

# }}}


def make_laplace_wrangler(traversal, order=None, *, level_to_order=None,
                          pairs=None, **kwargs):
    """Convenience factory choosing the wrangler by dimension.

    Pass either a global *order* or a *level_to_order* callable (the
    reference's ``fmm_level_to_order``); other keyword arguments (e.g.
    ``dipole_vec``, ``rscale``) are forwarded to the wrangler
    constructor.

    :arg pairs: use the complex-free ``[re | im]`` real-pair wrangler
        (3D only).  Default *None* = automatic: real pairs on
        accelerator backends (whose compilers may lack complex support
        — the tunneled TPU rejects every complex op), complex on CPU.
        A complex ``dtype=`` keyword forces the complex wrangler.
    """
    if (order is None) == (level_to_order is None):
        raise TypeError("pass exactly one of order / level_to_order")
    if level_to_order is not None:
        order = max(int(level_to_order(lev))
                    for lev in range(traversal.tree.nlevels))
        kwargs["level_to_order"] = level_to_order
    dim = traversal.tree.dimensions
    ti = LaplaceTreeIndependentDataForWrangler(dim, order)
    if dim not in (2, 3):
        raise NotImplementedError(f"no Laplace wrangler for dim={dim}")
    if pairs is None:
        dt = kwargs.get("dtype")
        pairs = (jax.default_backend() != "cpu"
                 and not (dt is not None
                          and np.issubdtype(np.dtype(dt),
                                            np.complexfloating)))
    if pairs:
        dt = kwargs.get("dtype")
        if dt is not None and np.issubdtype(np.dtype(dt),
                                            np.complexfloating):
            # a complex request maps to the real dtype of the pairs
            kwargs["dtype"] = np.zeros(0, dt).real.dtype
        cls = (Laplace2DPairsExpansionWrangler if dim == 2
               else Laplace3DPairsExpansionWrangler)
        return cls(ti, traversal, **kwargs)
    cls = (Laplace2DExpansionWrangler if dim == 2
           else Laplace3DExpansionWrangler)
    return cls(ti, traversal, **kwargs)
