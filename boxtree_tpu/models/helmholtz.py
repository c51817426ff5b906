"""Native 2D Helmholtz expansion wrangler.

Counterpart of the reference's pyfmmlib Helmholtz backend
(``boxtree/pyfmmlib_integration.py``, Helmholtz branch): the kernel is
``G(t, s) = (i/4) H_0^(1)(k |t - s|)``.

Expansions about a box center ``c`` (polar ``(r, th)`` of ``z - c``),
with coefficient index ``n`` running over ``-p..p``:

- multipole: ``phi = sum_n a_n H_n^(1)(k r) e^{i n th}``,
  ``a_n = (i/4) sum_j q_j J_n(k r_j) e^{-i n th_j}``
- local:     ``phi = sum_n b_n J_n(k r) e^{i n th}``,
  P2L: ``b_n = (i/4) q H_n^(1)(k r_s) e^{-i n th_s}``
- translations (Graf's addition theorem; every convention pinned
  numerically against direct evaluation, tests/test_helmholtz.py), with
  ``d = c_old - c_new`` (M2M/L2L) or ``d = c_src - c_tgt`` (M2L):

  - M2M/L2L: ``T[m, n] = J_{m-n}(k |d|) e^{-i (m-n) arg d}``
  - M2L:     ``T[m, n] = H_{m-n}(k |d|) e^{-i (m-n) arg d}``

Translation matrices are built on the host with :mod:`scipy.special`
(per level and child digit / translation class); the device-side Bessel
basis (J and Y up to order ``p``) runs as a pure-jnp Miller recurrence
(:mod:`boxtree_tpu.ops.cylinder_bessel`) — no host round-trips on the
hot path.

Note: unlike Laplace, the Helmholtz M2L operator depends on ``k * box
size`` and is therefore per-level even in scaled form; accuracy requires
the usual low-frequency condition (``p`` comfortably above ``k *
root_extent / 2^level`` at the coarsest interacting level).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxtree_tpu.fmm.drive import TreeIndependentDataForWrangler
from boxtree_tpu.models.expansion_base import ExpansionWranglerBase


class HelmholtzTreeIndependentDataForWrangler(
        TreeIndependentDataForWrangler):
    def __init__(self, dim, helmholtz_k, order):
        if dim != 2:
            raise NotImplementedError("Helmholtz wrangler is 2D for now")
        self.dim = dim
        self.helmholtz_k = float(helmholtz_k)
        self.order = order


from functools import partial as _partial

from boxtree_tpu.ops.cylinder_bessel import cylindrical_jy, miller_start


@_partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _device_JH(p, nstart, x):
    """J_n / H_n for n = 0..p on device (pure-jnp Miller recurrences,
    :mod:`boxtree_tpu.ops.cylinder_bessel`); shapes are ``x.shape +
    (p+1,)``.  *nstart* is the static downward-recurrence start (from
    :func:`~boxtree_tpu.ops.cylinder_bessel.miller_start` at the
    wrangler's k * distance bound).  Differentiable: the JVP evaluates
    one order higher and uses ``dF_n/dx = (F_{n-1} - F_{n+1})/2`` (with
    ``F_{-1} = -F_1``), which is what makes the base wrangler's
    JVP-based dipole path work for Helmholtz too."""
    j, y = cylindrical_jy(x, p, nstart=nstart)
    return j, j + 1j * y


@_device_JH.defjvp
def _device_JH_jvp(p, nstart, primals, tangents):
    x, = primals
    xdot, = tangents
    j1, h1 = _device_JH(p + 1, nstart, x)    # orders 0..p+1

    def deriv(f):
        # F_{n-1} for n = 0..p, using F_{-1} = -F_1
        lower = jnp.concatenate([-f[..., 1:2], f[..., :p]], axis=-1)
        upper = f[..., 1:p + 2]          # F_{n+1} for n = 0..p
        return 0.5 * (lower - upper)

    out = (j1[..., :p + 1], h1[..., :p + 1])
    dots = (deriv(j1) * xdot[..., None],
            deriv(h1) * xdot[..., None].astype(jnp.complex128))
    return out, dots


@_partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _device_JY(p, nstart, x):
    """Real (J_n, Y_n) pair for n = 0..p — the complex-free sibling of
    :func:`_device_JH` for the real-pair wrangler (no complex dtype
    ever touches the device)."""
    return cylindrical_jy(x, p, nstart=nstart)


@_device_JY.defjvp
def _device_JY_jvp(p, nstart, primals, tangents):
    x, = primals
    xdot, = tangents
    j1, y1 = _device_JY(p + 1, nstart, x)

    def deriv(f):
        lower = jnp.concatenate([-f[..., 1:2], f[..., :p]], axis=-1)
        upper = f[..., 1:p + 2]
        return 0.5 * (lower - upper)

    out = (j1[..., :p + 1], y1[..., :p + 1])
    dots = (deriv(j1) * xdot[..., None], deriv(y1) * xdot[..., None])
    return out, dots


class Helmholtz2DExpansionWrangler(ExpansionWranglerBase):
    """2D Helmholtz FMM wrangler; see module docstring."""

    dtype = np.complex128
    _supports_rscale = True

    def __init__(self, tree_indep, traversal, **kwargs):
        self.order = tree_indep.order
        self.k = tree_indep.helmholtz_k
        p = self.order
        self._ns = np.arange(-p, p + 1)
        # static Miller start: |rel| in any P2M/M2P/P2L/L2P/P2P stage is
        # bounded by the root diagonal plus slack (+1 order: the dipole
        # JVP evaluates p+1)
        root = float(np.asarray(traversal.tree.root_extent))
        xmax = self.k * root * (2.0 * np.sqrt(tree_indep.dim) + 1.0)
        self._nstart = miller_start(p + 2, xmax)
        super().__init__(tree_indep, traversal, **kwargs)

    def _ncoeff(self):
        return 2 * self.order + 1

    def _coeff_orders(self):
        return np.abs(self._ns)

    def _rscale_factor(self):
        return abs(self.k)

    # {{{ host operators
    #
    # rscale convention (the role of pyfmmlib's rscale arguments,
    # ``boxtree/pyfmmlib_integration.py:393-402``): with the diagonal
    # D_r = diag(r^|n|), scaled expansions are M~ = D_r^-1 M (multipole)
    # and L~ = D_r L (local), so every coefficient stays O(1) on deep
    # trees.  The scaled operators are then
    #     M2M: D_p^-1 B D_c      L2L: D_c B D_p^-1      M2L: D_r B D_r
    # built WITHOUT forming the unscaled entries (H_70 at deep-level
    # arguments overflows float64): the radial tables come s-scaled from
    # :mod:`boxtree_tpu.ops.scaled_bessel_host` and the leftover powers
    # have provably nonnegative exponents (triangle inequality on
    # |m - n|).

    def _graf_matrix(self, d, kind):
        from scipy import special as sp
        p = self.order
        ns = self._ns
        rd = float(np.hypot(d[0], d[1]))
        ad = float(np.arctan2(d[1], d[0]))
        dn = ns[:, None] - ns[None, :]                  # m - n
        if kind == "J":
            vals = sp.jv(dn, self.k * rd)
        else:
            vals = sp.hankel1(dn, self.k * rd)
        return vals * np.exp(-1j * dn * ad)

    def _scaled_graf(self, d, kind, s):
        """Graf entries with the radial factor pre-scaled:
        ``J_{m-n} * s^-|m-n|`` or ``H_{m-n} * s^+|m-n|``."""
        from boxtree_tpu.ops import scaled_bessel_host as sbh
        p = self.order
        ns = self._ns
        rd = float(np.hypot(d[0], d[1]))
        ad = float(np.arctan2(d[1], d[0]))
        dn = ns[:, None] - ns[None, :]
        q = np.abs(dn)
        if kind == "J":
            tab = sbh.jv_scaled(self.k * rd, 2 * p, s)
        else:
            tab = sbh.hankel1_scaled(self.k * rd, 2 * p, s)
        sigma = np.where(dn < 0, (-1.0) ** q, 1.0)      # F_-q=(-1)^q F_q
        return tab[q] * sigma * np.exp(-1j * dn * ad)

    def _m2m_matrix(self, t, r_child=1.0, r_parent=1.0):
        # base: t = new - old; Graf d = old - new
        d = -np.asarray(t)
        if r_child == 1.0 and r_parent == 1.0:
            return self._graf_matrix(d, "J")
        ns, am = self._ns, np.abs(self._ns)
        q = np.abs(ns[:, None] - ns[None, :])
        base = self._scaled_graf(d, "J", r_child)
        e = q + am[None, :] - am[:, None]               # >= 0
        return base * r_child ** e \
            * (r_child / r_parent) ** am[:, None]

    def _l2l_matrix(self, t, r_parent=1.0, r_child=1.0):
        d = -np.asarray(t)
        if r_child == 1.0 and r_parent == 1.0:
            return self._graf_matrix(d, "J")
        ns, am = self._ns, np.abs(self._ns)
        q = np.abs(ns[:, None] - ns[None, :])
        base = self._scaled_graf(d, "J", r_child)
        e = q + am[:, None] - am[None, :]               # >= 0
        return base * r_child ** e \
            * (r_child / r_parent) ** am[None, :]

    def _m2l_matrix(self, t, r=1.0):
        # base: t = c_tgt - c_src; d = src - tgt
        d = -np.asarray(t)
        if r == 1.0:
            return self._graf_matrix(d, "H")
        am = np.abs(self._ns)
        q = np.abs(self._ns[:, None] - self._ns[None, :])
        base = self._scaled_graf(d, "H", r)
        e = am[:, None] + am[None, :] - q               # >= 0
        return base * r ** e

    # }}}

    # {{{ device basis

    def _dpow(self, scale, sign):
        """``scale^(sign |n|)`` diagonal over the coefficient axis, or
        None when rscale is off (scale == 1.0 exactly)."""
        if isinstance(scale, (int, float)) and scale == 1.0:
            return None
        d = jnp.asarray(np.abs(self._ns), jnp.float64)
        return jnp.asarray(scale)[..., None] ** (sign * d)

    def _basis(self, rel, kind, conj_phase, scale=1.0):
        """(..., 2p+1) values of J_n/H_n(k r) e^{+-i n th}, n=-p..p.

        *rel* arrives in rscale-divided coordinates (see base class);
        the physical radius is recovered as ``r * scale`` and the
        result carries the diagonal ``scale^{-|n|}`` (J: scaled
        multipole/local basis) or ``scale^{+|n|}`` (H)."""
        p = self.order
        pw = self._dpow(scale, -1 if kind == "J" else +1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r = jnp.sqrt(rel[0] ** 2 + rel[1] ** 2)
        ok = r > 0
        r_safe = jnp.where(ok, r, 1.0)
        th = jnp.arctan2(rel[1], rel[0])
        j, h = _device_JH(p, self._nstart, self.k * r_safe)
        base = j if kind == "J" else h                 # (..., p+1)
        # extend to negative orders: F_{-n} = (-1)^n F_n
        signs = jnp.asarray((-1.0) ** np.arange(1, p + 1))
        neg = base[..., 1:] * signs
        full = jnp.concatenate([neg[..., ::-1], base], axis=-1)
        phase = jnp.exp(conj_phase * 1j * jnp.asarray(self._ns)
                        * th[..., None])
        out = full.astype(jnp.complex128) * phase
        if pw is not None:
            out = out * pw
        if kind == "J":
            # exact r == 0 limit: J_n(0) = [n == 0] (the H-kind callers
            # mask by *ok* instead; J-kind results are used unguarded by
            # _p2m_terms/_l2p_eval, so a particle exactly at its box
            # center must get the one-hot limit, not J_n(k * r_safe)
            one_hot = jnp.zeros(out.shape[-1:], out.dtype).at[p].set(1.0)
            out = jnp.where(ok[..., None], out, one_hot)
        return out, ok

    def _p2m_terms(self, rel, q, scale=1.0):
        vals, _ = self._basis(rel, "J", -1, scale)
        return (0.25j) * q.astype(self.dtype)[..., None] * vals

    def _l2p_eval(self, rel, loc, scale=1.0):
        vals, _ = self._basis(rel, "J", +1, scale)
        return jnp.sum(loc * vals, axis=-1)

    def _m2p_eval(self, rel, mp, scale=1.0):
        vals, ok = self._basis(rel.astype(jnp.float64), "H", +1, scale)
        return jnp.where(ok, jnp.sum(mp * vals, axis=-1), 0)

    def _p2l_terms(self, rel, q, scale=1.0):
        vals, ok = self._basis(rel.astype(jnp.float64), "H", -1, scale)
        terms = (0.25j) * q.astype(self.dtype)[..., None] * vals
        return jnp.where(ok[..., None], terms, 0)

    def _p2p(self, tgt_pts, src_pts, src_valid, q):
        diff = tgt_pts[:, None, :] - src_pts[None, :, :]
        r = jnp.sqrt((diff * diff).sum(-1))
        ok = (r > 0) & src_valid[None, :]
        _, h = _device_JH(0, self._nstart,
                  self.k * jnp.where(ok, r, 1.0))
        g = jnp.where(ok, (0.25j) * h[..., 0], 0)
        return g @ q.astype(self.dtype)

    # }}}


class Helmholtz2DPairsExpansionWrangler(Helmholtz2DExpansionWrangler):
    """Complex-free 2D Helmholtz wrangler: ``[re | im]`` real-pair
    coefficients, pair-expanded real operators, and ``(..., 2)``
    ``[re, im]`` potential lanes (see the 3D pairs wranglers for the
    rationale — TPU backends without complex support).  The radial
    tables come from the real ``(J, Y)`` Miller recurrences; the
    angular phase is carried as (cos, sin) lanes."""

    dtype = np.float64
    _pot_extra_dims = (2,)

    def reorder_sources(self, a):
        if jnp.iscomplexobj(a):
            raise TypeError(
                "the real-pair wrangler takes REAL source weights; "
                "complex weights are linear — drive the re/im parts "
                "separately and combine")
        return super().reorder_sources(a)

    def _ncoeff(self):
        return 2 * (2 * self.order + 1)

    def _coeff_orders(self):
        return np.tile(np.abs(self._ns), 2)

    # {{{ host operators (complex builders, pair-expanded)

    def _m2m_matrix(self, *a, **k):
        from boxtree_tpu.ops.solid_harmonics import pair_matrix
        return pair_matrix(
            Helmholtz2DExpansionWrangler._m2m_matrix(self, *a, **k))

    def _l2l_matrix(self, *a, **k):
        from boxtree_tpu.ops.solid_harmonics import pair_matrix
        return pair_matrix(
            Helmholtz2DExpansionWrangler._l2l_matrix(self, *a, **k))

    def _m2l_matrix(self, *a, **k):
        from boxtree_tpu.ops.solid_harmonics import pair_matrix
        return pair_matrix(
            Helmholtz2DExpansionWrangler._m2l_matrix(self, *a, **k))

    # }}}

    # {{{ device hooks (pair lanes)

    def _basis_pairs(self, rel, kind, conj_phase, scale=1.0):
        """(..., 2p+1) re/im lanes of J_n/H_n(k r) e^{+-i n th}."""
        p = self.order
        pw = self._dpow(scale, -1 if kind == "J" else +1)
        if pw is not None:
            rel = rel * jnp.asarray(scale)
        r = jnp.sqrt(rel[0] ** 2 + rel[1] ** 2)
        ok = r > 0
        r_safe = jnp.where(ok, r, 1.0)
        th = jnp.arctan2(rel[1], rel[0])
        j, y = _device_JY(p, self._nstart, self.k * r_safe)
        signs = jnp.asarray((-1.0) ** np.arange(1, p + 1))

        def full(base):
            neg = base[..., 1:] * signs
            return jnp.concatenate([neg[..., ::-1], base], axis=-1)

        ns = jnp.asarray(self._ns)
        c = jnp.cos(ns * th[..., None])
        s = conj_phase * jnp.sin(ns * th[..., None])
        if kind == "J":
            fj = full(j)
            vr, vi = fj * c, fj * s
        else:
            fj, fy = full(j), full(y)
            vr = fj * c - fy * s
            vi = fj * s + fy * c
        if pw is not None:
            vr, vi = vr * pw, vi * pw
        if kind == "J":
            # exact r == 0 limit: J_n(0) = [n == 0]
            one_hot = jnp.zeros(vr.shape[-1:], vr.dtype).at[p].set(1.0)
            vr = jnp.where(ok[..., None], vr, one_hot)
            vi = jnp.where(ok[..., None], vi, 0)
        return vr, vi, ok

    def _p2m_terms(self, rel, q, scale=1.0):
        # 0.25 i * q * vals -> (-0.25 q v_i, 0.25 q v_r)
        vr, vi, _ = self._basis_pairs(rel, "J", -1, scale)
        qq = 0.25 * q.astype(self.dtype)[..., None]
        return jnp.concatenate([-qq * vi, qq * vr], axis=-1)

    def _l2p_eval(self, rel, loc, scale=1.0):
        vr, vi, _ = self._basis_pairs(rel, "J", +1, scale)
        nc = 2 * self.order + 1
        lr, li = loc[..., :nc], loc[..., nc:]
        return jnp.stack([jnp.sum(lr * vr - li * vi, axis=-1),
                          jnp.sum(lr * vi + li * vr, axis=-1)], axis=-1)

    def _m2p_eval(self, rel, mp, scale=1.0):
        vr, vi, ok = self._basis_pairs(rel, "H", +1, scale)
        nc = 2 * self.order + 1
        mr, mi = mp[..., :nc], mp[..., nc:]
        return jnp.stack(
            [jnp.where(ok, jnp.sum(mr * vr - mi * vi, axis=-1), 0),
             jnp.where(ok, jnp.sum(mr * vi + mi * vr, axis=-1), 0)],
            axis=-1)

    def _p2l_terms(self, rel, q, scale=1.0):
        vr, vi, ok = self._basis_pairs(rel, "H", -1, scale)
        qq = 0.25 * q.astype(self.dtype)[..., None]
        t_re = jnp.where(ok[..., None], -qq * vi, 0)
        t_im = jnp.where(ok[..., None], qq * vr, 0)
        return jnp.concatenate([t_re, t_im], axis=-1)

    def _p2p(self, tgt_pts, src_pts, src_valid, q):
        diff = tgt_pts[:, None, :] - src_pts[None, :, :]
        r = jnp.sqrt((diff * diff).sum(-1))
        ok = (r > 0) & src_valid[None, :]
        j, y = _device_JY(0, self._nstart,
                          self.k * jnp.where(ok, r, 1.0))
        # g = 0.25 i (J0 + i Y0) = (-0.25 Y0, 0.25 J0)
        gr = jnp.where(ok, -0.25 * y[..., 0], 0)
        gi = jnp.where(ok, 0.25 * j[..., 0], 0)
        return jnp.stack([gr @ q, gi @ q], axis=-1)

    # }}}


def make_helmholtz_wrangler(traversal, helmholtz_k, order, **kwargs):
    """Delegates to the dimension-dispatching factory (which also
    handles the ``pairs=`` real-pair selection); kept here for
    backward compatibility of imports."""
    from boxtree_tpu.models.helmholtz3d import (
        make_helmholtz_wrangler as make,
    )
    return make(traversal, helmholtz_k, order, **kwargs)
