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
basis (J and Y up to order ``p``) is evaluated through
``jax.pure_callback`` into scipy — exact and simple; a pure-jnp Miller
recurrence is the later optimization.

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


def _host_JH(p, x):
    """scipy J_n and H^(1)_n for n = 0..p at points x (host); order axis
    is trailing so the callback is vmap-compatible (batch axes lead)."""
    from scipy import special as sp
    n = np.arange(p + 1)[None, :]
    xf = np.asarray(x, np.float64).reshape(-1, 1)
    j = sp.jv(n, xf)
    y = sp.yv(n, xf)
    return (j.reshape(np.shape(x) + (p + 1,)),
            (j + 1j * y).reshape(np.shape(x) + (p + 1,)))


from functools import partial as _partial


@_partial(jax.custom_jvp, nondiff_argnums=(0,))
def _device_JH(p, x):
    """J_n / H_n for n = 0..p on device via a host callback; shapes are
    ``x.shape + (p+1,)``.  Differentiable: the JVP evaluates one order
    higher and uses ``dF_n/dx = (F_{n-1} - F_{n+1})/2`` (with
    ``F_{-1} = -F_1``), which is what makes the base wrangler's JVP-based
    dipole path work for Helmholtz too."""
    shape = jax.ShapeDtypeStruct(x.shape + (p + 1,), jnp.float64)
    cshape = jax.ShapeDtypeStruct(x.shape + (p + 1,), jnp.complex128)

    def cb(xh):
        return _host_JH(p, np.asarray(xh))

    return jax.pure_callback(cb, (shape, cshape), x,
                             vmap_method="broadcast_all")


@_device_JH.defjvp
def _device_JH_jvp(p, primals, tangents):
    x, = primals
    xdot, = tangents
    j1, h1 = _device_JH(p + 1, x)        # orders 0..p+1

    def deriv(f):
        # F_{n-1} for n = 0..p, using F_{-1} = -F_1
        lower = jnp.concatenate([-f[..., 1:2], f[..., :p]], axis=-1)
        upper = f[..., 1:p + 2]          # F_{n+1} for n = 0..p
        return 0.5 * (lower - upper)

    out = (j1[..., :p + 1], h1[..., :p + 1])
    dots = (deriv(j1) * xdot[..., None],
            deriv(h1) * xdot[..., None].astype(jnp.complex128))
    return out, dots


class Helmholtz2DExpansionWrangler(ExpansionWranglerBase):
    """2D Helmholtz FMM wrangler; see module docstring."""

    dtype = np.complex128

    def __init__(self, tree_indep, traversal, **kwargs):
        self.order = tree_indep.order
        self.k = tree_indep.helmholtz_k
        p = self.order
        self._ns = np.arange(-p, p + 1)
        super().__init__(tree_indep, traversal, **kwargs)

    def _ncoeff(self):
        return 2 * self.order + 1

    # {{{ host operators

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

    def _m2m_matrix(self, t, r_child=1.0, r_parent=1.0):
        # base: t = new - old; Graf d = old - new (rscale unsupported)
        return self._graf_matrix(-np.asarray(t), "J")

    def _l2l_matrix(self, t, r_parent=1.0, r_child=1.0):
        return self._graf_matrix(-np.asarray(t), "J")

    def _m2l_matrix(self, t, r=1.0):
        # base: t = c_tgt - c_src; d = src - tgt (rscale unsupported)
        return self._graf_matrix(-np.asarray(t), "H")

    # }}}

    # {{{ device basis

    def _basis(self, rel, kind, conj_phase):
        """(..., 2p+1) values of J_n/H_n(k r) e^{+-i n th}, n=-p..p."""
        p = self.order
        r = jnp.sqrt(rel[0] ** 2 + rel[1] ** 2)
        ok = r > 0
        r_safe = jnp.where(ok, r, 1.0)
        th = jnp.arctan2(rel[1], rel[0])
        j, h = _device_JH(p, self.k * r_safe)
        base = j if kind == "J" else h                 # (..., p+1)
        # extend to negative orders: F_{-n} = (-1)^n F_n
        signs = jnp.asarray((-1.0) ** np.arange(1, p + 1))
        neg = base[..., 1:] * signs
        full = jnp.concatenate([neg[..., ::-1], base], axis=-1)
        phase = jnp.exp(conj_phase * 1j * jnp.asarray(self._ns)
                        * th[..., None])
        out = full.astype(jnp.complex128) * phase
        if kind == "J":
            # exact r == 0 limit: J_n(0) = [n == 0] (the H-kind callers
            # mask by *ok* instead; J-kind results are used unguarded by
            # _p2m_terms/_l2p_eval, so a particle exactly at its box
            # center must get the one-hot limit, not J_n(k * r_safe)
            one_hot = jnp.zeros(out.shape[-1:], out.dtype).at[p].set(1.0)
            out = jnp.where(ok[..., None], out, one_hot)
        return out, ok

    def _p2m_terms(self, rel, q):
        vals, _ = self._basis(rel, "J", -1)
        return (0.25j) * q.astype(self.dtype)[..., None] * vals

    def _l2p_eval(self, rel, loc):
        vals, _ = self._basis(rel, "J", +1)
        return jnp.sum(loc * vals, axis=-1)

    def _m2p_eval(self, rel, mp, scale=1.0):
        vals, ok = self._basis(rel.astype(jnp.float64), "H", +1)
        return jnp.where(ok, jnp.sum(mp * vals, axis=-1), 0)

    def _p2l_terms(self, rel, q, scale=1.0):
        vals, ok = self._basis(rel.astype(jnp.float64), "H", -1)
        terms = (0.25j) * q.astype(self.dtype)[..., None] * vals
        return jnp.where(ok[..., None], terms, 0)

    def _p2p(self, tgt_pts, src_pts, src_valid, q):
        diff = tgt_pts[:, None, :] - src_pts[None, :, :]
        r = jnp.sqrt((diff * diff).sum(-1))
        ok = (r > 0) & src_valid[None, :]
        _, h = _device_JH(0, self.k * jnp.where(ok, r, 1.0))
        g = jnp.where(ok, (0.25j) * h[..., 0], 0)
        return g @ q.astype(self.dtype)

    # }}}


def make_helmholtz_wrangler(traversal, helmholtz_k, order, **kwargs):
    ti = HelmholtzTreeIndependentDataForWrangler(
        traversal.tree.dimensions, helmholtz_k, order)
    return Helmholtz2DExpansionWrangler(ti, traversal, **kwargs)
