"""Native 3D Helmholtz expansion wrangler.

Counterpart of the reference's pyfmmlib Helmholtz 3D backend
(``boxtree/pyfmmlib_integration.py:133-269`` dispatches dim/eqn; the 3D
Helmholtz stages run Fortran h3d* routines).  Kernel:
``G(t, s) = exp(ik|t-s|) / |t-s|``.

Basis: spherical wave functions in the (unnormalized) angular basis
``A_n^m`` of :mod:`boxtree_tpu.ops.solid_harmonics` evaluated on the unit
sphere (``A_n^m(u) = R_n^m(u)``, |u| = 1):

- regular:  ``HR_n^m(x) = j_n(k|x|) A_n^m(x/|x|)``
- outgoing: ``HS_n^m(x) = h^(1)_n(k|x|) A_n^m(x/|x|)``

with Green's function expansion (|x'| > |y'| about a center c)::

    G = sum_nm w_nm j_n(k|y'|) conj(A_n^m(y'^)) h_n(k|x'|) A_n^m(x'^),
    w_nm = 4 pi i k D_nm^2,   Y_n^m = D_nm A_n^m (orthonormal Y)

so P2M is ``M_nm += q w_nm conj(HR_nm(y - c))`` and evaluation is
``phi = sum M_nm HS_nm(x - c)`` (P2L/L2P mirror with h <-> j).

Translation operators are built on the host from the EXACT Gaunt-series
addition theorem (derived from the plane-wave expansion; every identity
is pinned by tests/test_helmholtz3d.py against brute-force evaluation)::

    F_n^m(x + t) = sum_{nu,mu} T[numu, nm](t) Rg_nu^mu(x)
    T_Y[numu, nm] = 4 pi sum_q i^(q+nu-n) f_q(k|t|) Y_q^(m-mu)(t^)
                    * Gaunt(n,m | nu,mu | q, m-mu)

with ``f = j`` for regular translations (M2M/L2L and S|S) and
``f = h^(1)`` for M2L.  Gaunt coefficients are computed exactly with
Gauss-Legendre quadrature (the integrand is a polynomial in cos theta).
The device-side radial functions are the pure-jnp recurrences of
:mod:`boxtree_tpu.ops.spherical_bessel` — no host callbacks on the hot
path (the 2D wrangler uses the same design via
:mod:`boxtree_tpu.ops.cylinder_bessel`).

Accuracy requires the usual low-frequency condition (order comfortably
above ``k * box_size`` at the coarsest interacting level).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxtree_tpu.fmm.drive import TreeIndependentDataForWrangler
from boxtree_tpu.models.expansion_base import ExpansionWranglerBase
from boxtree_tpu.ops import solid_harmonics as sh
from boxtree_tpu.ops import spherical_bessel as sb


def _sph_harm_y(n, m, theta, phi):
    """Orthonormal Y_n^m (scipy), tolerant of scipy API versions."""
    from scipy import special as sp
    if hasattr(sp, "sph_harm_y"):
        return sp.sph_harm_y(n, m, theta, phi)
    return sp.sph_harm(m, n, phi, theta)


def _y_table_at(theta, phi, lmax):
    """Y_l^s(theta, phi) for all 0 <= l <= lmax, -l <= s <= l:
    returns array (lmax+1, 2*lmax+1) indexed [l, s + lmax]."""
    out = np.zeros((lmax + 1, 2 * lmax + 1), np.complex128)
    for ell in range(lmax + 1):
        for s in range(-ell, ell + 1):
            out[ell, s + lmax] = _sph_harm_y(ell, s, theta, phi)
    return out


class Helmholtz3DTreeIndependentDataForWrangler(
        TreeIndependentDataForWrangler):
    """Order, wavenumber, and the (one-time) Gaunt/normalization
    tables shared by every tree."""

    def __init__(self, helmholtz_k, order):
        self.dim = 3
        self.k = complex(helmholtz_k)
        if self.k.imag == 0:
            self.k = float(helmholtz_k)
        self.order = p = order
        self.nm_n = np.concatenate(
            [[n] * (2 * n + 1) for n in range(p + 1)]).astype(np.int64)
        self.nm_m = np.concatenate(
            [np.arange(-n, n + 1) for n in range(p + 1)])
        K = len(self.nm_n)

        # D_nm: Y_n^m = D_nm * A_n^m, pinned numerically at one generic
        # direction (both bases carry e^{im phi}, so the ratio is a
        # constant real number)
        theta0, phi0 = 1.1, 0.7
        u = np.array([np.sin(theta0) * np.cos(phi0),
                      np.sin(theta0) * np.sin(phi0),
                      np.cos(theta0)])
        a_vals = sh.regular(u[:, None], p)[0]          # (K,)
        d = np.empty(K)
        for i in range(K):
            y = _sph_harm_y(int(self.nm_n[i]), int(self.nm_m[i]),
                            theta0, phi0)
            ratio = y / a_vals[i]
            assert abs(ratio.imag) < 1e-10 * abs(ratio)
            d[i] = ratio.real
        self.D = d

        # Gaunt tensor G[(n,m),(nu,mu),q] = int Y_n^m conj(Y_nu^mu)
        # conj(Y_q^{m-mu}) dOmega, by exact Gauss-Legendre quadrature
        qmax = 2 * p
        nodes, weights = np.polynomial.legendre.leggauss(2 * p + 2)
        theta_i = np.arccos(nodes)
        # hat-Y table at phi=0 (real): (l, s, i)
        yh = np.zeros((qmax + 1, 2 * qmax + 1, len(nodes)))
        for ell in range(qmax + 1):
            for s in range(-ell, ell + 1):
                yh[ell, s + qmax] = _sph_harm_y(
                    ell, s, theta_i, 0.0).real
        ynm_i = yh[self.nm_n, self.nm_m + qmax]        # (K, i)
        s_idx = (self.nm_m[:, None] - self.nm_m[None, :]) + qmax  # (K,K)
        gaunt = np.zeros((K, K, qmax + 1))
        w = weights * 2 * np.pi
        n_a = self.nm_n[:, None]
        n_b = self.nm_n[None, :]
        s_ab = self.nm_m[:, None] - self.nm_m[None, :]
        for q in range(qmax + 1):
            yq = yh[q][s_idx]                          # (K, K, i)
            g = np.einsum("ai,bi,abi,i->ab", ynm_i, ynm_i, yq, w)
            # exact selection rules — entries outside them are ZERO, and
            # the quadrature's ~1e-16 noise there would otherwise be
            # amplified by the D_out/D_in basis ratios (up to ~1e14)
            keep = ((q >= np.abs(n_a - n_b)) & (q <= n_a + n_b)
                    & (((n_a + n_b + q) % 2) == 0)
                    & (np.abs(s_ab) <= q))
            gaunt[:, :, q] = np.where(keep, g, 0.0)
        self.gaunt = gaunt
        self.qmax = qmax
        # i^{nu - n} pair phase (rows = output nu, cols = input n);
        # the i^q factor is applied per q in translation_matrix
        self.phase_pair = (1j) ** (
            self.nm_n[:, None] - self.nm_n[None, :])

    def _tmat(self, t, fhat, pw=None):
        """Shared Gaunt-series assembly: radial table *fhat* (qmax+1,),
        optional per-q elementwise multiplier ``pw(q) -> (K, K)`` in
        (in, out) orientation; returns the (K, K) [out, in] operator in
        the A basis."""
        t = np.asarray(t, np.float64)
        r = np.linalg.norm(t)
        theta = np.arccos(np.clip(t[2] / r, -1, 1))
        phi = np.arctan2(t[1], t[0])
        q = np.arange(self.qmax + 1)
        yt = _y_table_at(theta, phi, self.qmax)        # (q, s+qmax)
        s_idx = (self.nm_m[:, None] - self.nm_m[None, :]) + self.qmax
        # yt_pairs[in=nm, out=numu, q] -> gather yt[q, m - mu]
        # careful: formula's s = m - mu with nm = input, numu = output
        coef = ((1j) ** q) * fhat                      # (q,)
        # gaunt indexed [in=nm, out=numu, q]; build T[out, in]
        yt_q = yt.T                                    # (s+qmax, q)
        ytp = yt_q[s_idx]                              # (in, out, q)
        if pw is None:
            T_in_out = 4 * np.pi * np.einsum(
                "abq,q->ab", self.gaunt * ytp, coef)
        else:
            K = self.nm_n.shape[0]
            T_in_out = np.zeros((K, K), np.complex128)
            for qq in range(self.qmax + 1):
                T_in_out += ((self.gaunt[:, :, qq] * ytp[:, :, qq])
                             * coef[qq]) * pw(qq)
            T_in_out *= 4 * np.pi
        T = T_in_out.T * self.phase_pair               # [out, in]
        # Y basis -> A basis: T_A = D_out T_Y D_in^{-1}
        return (self.D[:, None] * T) / self.D[None, :]

    def translation_matrix(self, t, kind):
        """Dense (K, K) translation operator in the A basis for shift
        *t*: out(x) = sum T[out, in] Rg basis — *kind* "J" (regular:
        M2M/L2L/S|S) or "H" (M2L)."""
        from scipy import special as sp
        q = np.arange(self.qmax + 1)
        x = self.k * np.linalg.norm(np.asarray(t, np.float64))
        if kind == "J":
            fq = sp.spherical_jn(q, x)
        else:
            fq = (sp.spherical_jn(q, x)
                  + 1j * sp.spherical_yn(q, x))
        return self._tmat(t, fq)

    # {{{ rscale-scaled operator builds
    #
    # Same diagonal convention as the 2D wrangler (scaled expansions
    # M~ = D_r^-1 M, L~ = D_r L with D_r = diag(r^n)); the radial table
    # comes pre-scaled (j_q r^-q / h_q r^+q) from
    # :mod:`boxtree_tpu.ops.scaled_bessel_host` and the per-q leftover
    # power has a nonnegative exponent wherever the Gaunt selection
    # rules (|n_a - n_b| <= q <= n_a + n_b) allow a nonzero entry, so
    # nothing overflows on deep trees.

    def _check_real_k(self):
        if not isinstance(self.k, float):
            raise NotImplementedError("rscale with complex helmholtz_k")

    def m2m_matrix_scaled(self, t, r_c, r_p):
        from boxtree_tpu.ops import scaled_bessel_host as sbh
        self._check_real_k()
        x = self.k * np.linalg.norm(np.asarray(t, np.float64))
        fhat = sbh.spherical_jn_scaled(x, self.qmax, r_c)
        na = self.nm_n[:, None]                        # axis a = input
        nb = self.nm_n[None, :]                        # axis b = output
        gam = nb.astype(np.float64)

        def pw(q):
            return (r_c ** np.maximum(q + na - nb, 0)
                    * (r_c / r_p) ** gam)
        return self._tmat(t, fhat, pw)

    def l2l_matrix_scaled(self, t, r_p, r_c):
        from boxtree_tpu.ops import scaled_bessel_host as sbh
        self._check_real_k()
        x = self.k * np.linalg.norm(np.asarray(t, np.float64))
        fhat = sbh.spherical_jn_scaled(x, self.qmax, r_c)
        na = self.nm_n[:, None]
        nb = self.nm_n[None, :]

        def pw(q):
            return (r_c ** np.maximum(q + nb - na, 0)
                    * (r_c / r_p) ** na.astype(np.float64))
        return self._tmat(t, fhat, pw)

    def m2l_matrix_scaled(self, t, r):
        from boxtree_tpu.ops import scaled_bessel_host as sbh
        self._check_real_k()
        x = self.k * np.linalg.norm(np.asarray(t, np.float64))
        fhat = sbh.spherical_hn1_scaled(x, self.qmax, r)
        na = self.nm_n[:, None]
        nb = self.nm_n[None, :]

        def pw(q):
            return r ** np.maximum(na + nb - q, 0)
        return self._tmat(t, fhat, pw)

    # }}}


class Helmholtz3DExpansionWrangler(ExpansionWranglerBase):
    """3D Helmholtz FMM wrangler; see module docstring."""

    dtype = np.complex128
    _supports_rscale = True

    def __init__(self, tree_indep, traversal, **kwargs):
        self.order = tree_indep.order
        self.k = tree_indep.k
        super().__init__(tree_indep, traversal, **kwargs)

    def _rscale_factor(self):
        return abs(self.k)

    def _ncoeff(self):
        return sh.ncoeffs(self.order)

    def _coeff_orders(self):
        return self.tree_indep.nm_n

    # {{{ host operators

    def _m2m_matrix(self, t, r_child=1.0, r_parent=1.0):
        if r_child == 1.0 and r_parent == 1.0:
            return self.tree_indep.translation_matrix(t, "J")
        return self.tree_indep.m2m_matrix_scaled(t, r_child, r_parent)

    def _l2l_matrix(self, t, r_parent=1.0, r_child=1.0):
        if r_child == 1.0 and r_parent == 1.0:
            return self.tree_indep.translation_matrix(t, "J")
        return self.tree_indep.l2l_matrix_scaled(t, r_parent, r_child)

    def _m2l_matrix(self, t, r=1.0):
        if r == 1.0:
            return self.tree_indep.translation_matrix(t, "H")
        return self.tree_indep.m2l_matrix_scaled(t, r)

    # }}}

    # {{{ device hooks

    def _angular(self, rel):
        """r, unit-direction angular basis A (with r=0 guard mask)."""
        r2 = (rel * rel).sum(axis=0)
        ok = r2 > 0
        r = jnp.sqrt(jnp.where(ok, r2, 1.0))
        u = jnp.where(ok, rel, jnp.array([0.0, 0.0, 1.0])[
            (slice(None),) + (None,) * (rel.ndim - 1)]) / r
        a = sh.regular(u, self.order, xp=jnp)          # (..., K)
        return r, ok, a

    @property
    def _w_nm(self):
        ti = self.tree_indep
        return jnp.asarray(4 * np.pi * 1j * ti.k * ti.D ** 2)

    def _radial_j(self, r):
        jr = sb.spherical_jn(self.k * r, self.order)
        return jr[..., jnp.asarray(self.tree_indep.nm_n)]

    def _radial_h(self, r):
        hr = sb.spherical_hn1(self.k * r, self.order)
        return hr[..., jnp.asarray(self.tree_indep.nm_n)]

    def _dpow(self, scale, sign):
        """``scale^(sign n)`` diagonal over the coefficient axis, or
        None when rscale is off (scale == 1.0 exactly)."""
        if isinstance(scale, (int, float)) and scale == 1.0:
            return None
        d = jnp.asarray(self.tree_indep.nm_n, jnp.float64)
        return jnp.asarray(scale)[..., None] ** (sign * d)

    def _p2m_terms(self, rel, q, scale=1.0):
        pw = self._dpow(scale, -1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r, ok, a = self._angular(rel)
        basis = self._radial_j(r) * jnp.conj(a)
        if pw is not None:
            basis = basis * pw
        terms = q.astype(self.dtype)[..., None] * self._w_nm * basis
        # r = 0 exact limit: j_n(0) = delta_n0, A_0^0 = 1 (scale^0 = 1)
        zero_lim = (q.astype(self.dtype)[..., None] * self._w_nm
                    * jnp.zeros(self.ncoeff, self.dtype).at[0].set(1.0))
        return jnp.where(ok[..., None], terms, zero_lim)

    def _l2p_eval(self, rel, loc, scale=1.0):
        pw = self._dpow(scale, -1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r, ok, a = self._angular(rel)
        basis = self._radial_j(r) * a
        if pw is not None:
            basis = basis * pw
        val = jnp.sum(loc * basis, axis=-1)
        return jnp.where(ok, val, loc[..., 0])

    def _m2p_eval(self, rel, mp, scale=1.0):
        pw = self._dpow(scale, +1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r, ok, a = self._angular(rel)
        basis = self._radial_h(r) * a
        if pw is not None:
            basis = basis * pw
        return jnp.where(ok, jnp.sum(mp * basis, axis=-1), 0)

    def _p2l_terms(self, rel, q, scale=1.0):
        pw = self._dpow(scale, +1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r, ok, a = self._angular(rel)
        basis = self._radial_h(r) * jnp.conj(a)
        if pw is not None:
            basis = basis * pw
        terms = q.astype(self.dtype)[..., None] * self._w_nm * basis
        return jnp.where(ok[..., None], terms, 0)

    def _p2p(self, tgt_pts, src_pts, src_valid, q):
        diff = tgt_pts[:, None, :] - src_pts[None, :, :]
        r2 = (diff * diff).sum(-1)
        r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
        g = jnp.where((r2 > 0) & src_valid[None, :],
                      jnp.exp(1j * self.k * r) / r, 0.0)
        return g.astype(self.dtype) @ q

    # }}}


class Helmholtz3DPairsExpansionWrangler(Helmholtz3DExpansionWrangler):
    """Complex-free 3D Helmholtz wrangler for TPU backends without
    complex support: ``[re | im]`` real-pair coefficients and
    2x2-expanded real operators (see
    :class:`~boxtree_tpu.models.laplace.Laplace3DPairsExpansionWrangler`
    for the rationale), and — because the Helmholtz potential is
    genuinely complex — potentials carried as ``(..., 2)`` real
    ``[re, im]`` lanes (``_pot_extra_dims``); ``drive_fmm`` returns a
    ``(ntargets, 2)`` real array.  Real ``helmholtz_k`` only (the
    radial j/y recurrences stay real there)."""

    dtype = np.float64
    _pot_extra_dims = (2,)

    def __init__(self, tree_indep, traversal, **kwargs):
        if complex(tree_indep.k).imag != 0:
            raise NotImplementedError(
                "real-pair Helmholtz wrangler requires real helmholtz_k")
        super().__init__(tree_indep, traversal, **kwargs)

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
            Helmholtz3DExpansionWrangler._m2m_matrix(self, *a, **k))

    def _l2l_matrix(self, *a, **k):
        return sh.pair_matrix(
            Helmholtz3DExpansionWrangler._l2l_matrix(self, *a, **k))

    def _m2l_matrix(self, *a, **k):
        return sh.pair_matrix(
            Helmholtz3DExpansionWrangler._m2l_matrix(self, *a, **k))

    _m2l_matrices_complex = Helmholtz3DExpansionWrangler._m2l_matrices

    # }}}

    # {{{ device hooks (pair lanes; w_nm = i * c with c real)

    @property
    def _w_c(self):
        ti = self.tree_indep
        return jnp.asarray(4 * np.pi * float(ti.k) * ti.D ** 2)

    def _angular_pairs(self, rel):
        r2 = (rel * rel).sum(axis=0)
        ok = r2 > 0
        r = jnp.sqrt(jnp.where(ok, r2, 1.0))
        u = jnp.where(ok, rel, jnp.array([0.0, 0.0, 1.0])[
            (slice(None),) + (None,) * (rel.ndim - 1)]) / r
        a = sh.regular_pairs(u, self.order, xp=jnp)    # (..., 2K)
        kc = sh.ncoeffs(self.order)
        return r, ok, a[..., :kc], a[..., kc:]

    def _p2m_terms(self, rel, q, scale=1.0):
        pw = self._dpow(scale, -1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r, ok, ar, ai = self._angular_pairs(rel)
        j = self._radial_j(r)
        br, bi = j * ar, -j * ai                       # j * conj(a)
        if pw is not None:
            br, bi = br * pw, bi * pw
        # terms = q * (i c) * b  ->  (-q c b_i, q c b_r)
        qc = q.astype(self.dtype)[..., None] * self._w_c
        t_re, t_im = -qc * bi, qc * br
        kc = sh.ncoeffs(self.order)
        # r = 0 exact limit: j_n(0) = delta_n0, A_0^0 = 1
        z_im = jnp.zeros(kc, self.dtype).at[0].set(1.0) * qc
        t_re = jnp.where(ok[..., None], t_re, 0)
        t_im = jnp.where(ok[..., None], t_im, z_im)
        return jnp.concatenate([t_re, t_im], axis=-1)

    def _l2p_eval(self, rel, loc, scale=1.0):
        pw = self._dpow(scale, -1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r, ok, ar, ai = self._angular_pairs(rel)
        j = self._radial_j(r)
        br, bi = j * ar, j * ai
        if pw is not None:
            br, bi = br * pw, bi * pw
        kc = sh.ncoeffs(self.order)
        lr, li = loc[..., :kc], loc[..., kc:]
        v_re = jnp.sum(lr * br - li * bi, axis=-1)
        v_im = jnp.sum(lr * bi + li * br, axis=-1)
        v_re = jnp.where(ok, v_re, loc[..., 0])
        v_im = jnp.where(ok, v_im, loc[..., kc])
        return jnp.stack([v_re, v_im], axis=-1)

    def _m2p_eval(self, rel, mp, scale=1.0):
        pw = self._dpow(scale, +1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r, ok, ar, ai = self._angular_pairs(rel)
        j = self._radial_j(r)
        y = self._radial_y(r)
        br, bi = j * ar - y * ai, j * ai + y * ar      # h * a
        if pw is not None:
            br, bi = br * pw, bi * pw
        kc = sh.ncoeffs(self.order)
        mr, mi = mp[..., :kc], mp[..., kc:]
        v_re = jnp.where(ok, jnp.sum(mr * br - mi * bi, axis=-1), 0)
        v_im = jnp.where(ok, jnp.sum(mr * bi + mi * br, axis=-1), 0)
        return jnp.stack([v_re, v_im], axis=-1)

    def _p2l_terms(self, rel, q, scale=1.0):
        pw = self._dpow(scale, +1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r, ok, ar, ai = self._angular_pairs(rel)
        j = self._radial_j(r)
        y = self._radial_y(r)
        br, bi = j * ar + y * ai, y * ar - j * ai      # h * conj(a)
        if pw is not None:
            br, bi = br * pw, bi * pw
        qc = q.astype(self.dtype)[..., None] * self._w_c
        t_re = jnp.where(ok[..., None], -qc * bi, 0)
        t_im = jnp.where(ok[..., None], qc * br, 0)
        return jnp.concatenate([t_re, t_im], axis=-1)

    def _radial_y(self, r):
        hr = sb.spherical_yn(self.k * r, self.order)
        return hr[..., jnp.asarray(self.tree_indep.nm_n)]

    def _p2p(self, tgt_pts, src_pts, src_valid, q):
        diff = tgt_pts[:, None, :] - src_pts[None, :, :]
        r2 = (diff * diff).sum(-1)
        ok = (r2 > 0) & src_valid[None, :]
        r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
        inv = jnp.where(ok, 1.0 / r, 0.0)
        gr = jnp.cos(self.k * r) * inv
        gi = jnp.sin(self.k * r) * inv
        return jnp.stack([gr @ q, gi @ q], axis=-1)

    # }}}


def make_helmholtz_wrangler(traversal, helmholtz_k, order, *,
                            pairs=None, **kwargs):
    """Factory choosing the Helmholtz wrangler by dimension (2D:
    :mod:`boxtree_tpu.models.helmholtz`; 3D: this module).

    :arg pairs: use the complex-free ``[re | im]`` real-pair wrangler
        (3D, real *helmholtz_k* only; potentials come back as
        ``(ntargets, 2)`` real lanes).  Default *None* = automatic:
        real pairs on accelerator backends, complex on CPU.
    """
    dim = traversal.tree.dimensions
    if dim not in (2, 3):
        raise NotImplementedError(f"no Helmholtz wrangler for dim={dim}")

    def want_pairs():
        if pairs is not None:
            return pairs
        dt = kwargs.get("dtype")
        return (jax.default_backend() != "cpu"
                and complex(helmholtz_k).imag == 0
                and not (dt is not None
                         and np.issubdtype(np.dtype(dt),
                                           np.complexfloating)))

    def real_dtype_kwargs():
        dt = kwargs.get("dtype")
        if dt is not None and np.issubdtype(np.dtype(dt),
                                            np.complexfloating):
            kwargs["dtype"] = np.zeros(0, dt).real.dtype
        return kwargs

    if dim == 2:
        from boxtree_tpu.models.helmholtz import (
            Helmholtz2DExpansionWrangler,
            Helmholtz2DPairsExpansionWrangler,
            HelmholtzTreeIndependentDataForWrangler,
        )
        ti = HelmholtzTreeIndependentDataForWrangler(2, helmholtz_k, order)
        if want_pairs():
            return Helmholtz2DPairsExpansionWrangler(
                ti, traversal, **real_dtype_kwargs())
        return Helmholtz2DExpansionWrangler(ti, traversal, **kwargs)
    ti = Helmholtz3DTreeIndependentDataForWrangler(helmholtz_k, order)
    if want_pairs():
        return Helmholtz3DPairsExpansionWrangler(
            ti, traversal, **real_dtype_kwargs())
    return Helmholtz3DExpansionWrangler(ti, traversal, **kwargs)
