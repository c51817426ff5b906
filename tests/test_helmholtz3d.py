"""3D Helmholtz wrangler tests: device Bessel recurrences vs scipy,
Gaunt-series translation identities vs brute force, and the full FMM vs
direct summation with complex charges and dipoles (mirrors the Helmholtz
3D coverage of the reference's pyfmmlib backend,
``test/test_fmm.py:398-528``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.helmholtz3d import (
    Helmholtz3DTreeIndependentDataForWrangler,
    make_helmholtz_wrangler,
)
from boxtree_tpu.ops import solid_harmonics as sh
from boxtree_tpu.ops import spherical_bessel as sb
from boxtree_tpu.traversal import build_traversal


@pytest.fixture(autouse=True)
def _clear_caches():
    yield
    jax.clear_caches()


def test_spherical_bessel_vs_scipy():
    from scipy import special as sp
    x = np.concatenate([np.logspace(-7, 1.5, 60), [0.0]])
    p = 20
    n = np.arange(p + 1)
    j_ours = np.asarray(sb.spherical_jn(jnp.asarray(x), p))
    j_ref = sp.spherical_jn(n[None, :], x[:, None])
    assert np.abs(j_ours - j_ref).max() < 1e-9
    xp = x[x > 0]
    y_ours = np.asarray(sb.spherical_yn(jnp.asarray(xp), p))
    y_ref = sp.spherical_yn(n[None, :], xp[:, None])
    rel = np.abs(y_ours - y_ref) / np.maximum(np.abs(y_ref), 1e-300)
    assert rel.max() < 1e-12


def _bases(ti, k):
    from scipy import special as sp
    nm = ti.nm_n.astype(int)

    def HR(x):
        r = np.linalg.norm(x)
        u = x / r
        return sp.spherical_jn(nm, k * r) * sh.regular(
            u[:, None], ti.order)[0]

    def HS(x):
        r = np.linalg.norm(x)
        u = x / r
        h = (sp.spherical_jn(nm, k * r)
             + 1j * sp.spherical_yn(nm, k * r))
        return h * sh.regular(u[:, None], ti.order)[0]

    return HR, HS


def test_translation_chain_converges():
    # M2M -> M2L -> L2L chain vs direct kernel; error must fall fast with
    # order (this pins every operator convention at once)
    k = 1.7
    rng = np.random.default_rng(1)
    ys = (rng.random((3, 5)) - 0.5) * 0.2
    qs = rng.standard_normal(5)
    c_t = np.array([0.62, -0.4, 0.84])
    xs = c_t[:, None] + (rng.random((3, 4)) - 0.5) * 0.2
    ref = np.array([
        sum(qs[i] * np.exp(1j * k * np.linalg.norm(xs[:, j] - ys[:, i]))
            / np.linalg.norm(xs[:, j] - ys[:, i]) for i in range(5))
        for j in range(4)])

    errs = []
    for pord in [6, 10, 14]:
        ti = Helmholtz3DTreeIndependentDataForWrangler(k, pord)
        HR, HS = _bases(ti, k)
        w = 4 * np.pi * 1j * k * ti.D ** 2
        M = sum(qs[i] * w * np.conj(HR(ys[:, i])) for i in range(5))
        c2 = np.array([0.05, 0.0, 0.05])
        M2 = ti.translation_matrix(c2, "J") @ M
        L = ti.translation_matrix(c_t - c2, "H") @ M2
        c_t2 = c_t + np.array([-0.04, 0.05, 0.03])
        L2 = ti.translation_matrix(c_t2 - c_t, "J") @ L
        phi = np.array([L2 @ HR(xs[:, j] - c_t2) for j in range(4)])
        errs.append(np.abs(phi - ref).max() / np.abs(ref).max())
    assert errs[0] < 1e-6 and errs[1] < 1e-9 and errs[2] < 1e-12, errs


def test_helmholtz3d_fmm():
    rng = np.random.default_rng(11)
    n = 600
    pts = rng.random((3, n))
    k = 2.0
    tree = build_tree(pts, max_particles_in_box=20)
    trav = build_traversal(tree)
    q = rng.standard_normal(n) + 1j * rng.standard_normal(n)

    w = make_helmholtz_wrangler(trav, k, order=12)
    pot = np.asarray(drive_fmm(w, (q,)))

    d = pts[:, :, None] - pts[:, None, :]
    r = np.sqrt((d * d).sum(0))
    rs = np.where(r > 0, r, 1.0)
    g = np.where(r > 0, np.exp(1j * k * rs) / rs, 0)
    ref = g @ q
    err = np.abs(pot - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_helmholtz3d_fmm_dipoles():
    rng = np.random.default_rng(12)
    n = 500
    pts = rng.random((3, n))
    k = 2.0
    tree = build_tree(pts, max_particles_in_box=20)
    trav = build_traversal(tree)
    q = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    dip = rng.standard_normal((3, n))

    w = make_helmholtz_wrangler(trav, k, order=12, dipole_vec=dip)
    pot = np.asarray(drive_fmm(w, (q,)))

    d = pts[:, :, None] - pts[:, None, :]     # x_i - y_j
    r = np.sqrt((d * d).sum(0))
    rs = np.where(r > 0, r, 1.0)
    g = np.where(r > 0, np.exp(1j * k * rs) / rs, 0)
    gp = np.where(r > 0, (1j * k - 1 / rs) * g, 0)     # dG/dr
    # (dip . grad_y) G = dG/dr * (y - x)/r . dip
    num = ((-d) * dip[:, None, :]).sum(0)
    ref = ((gp * np.where(r > 0, num / rs, 0)) * q[None, :]).sum(1)
    err = np.abs(pot - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_helmholtz3d_pairs_matches_complex():
    """The complex-free real-pair Helmholtz wrangler ([re | im]
    coefficients, (ntargets, 2) potential lanes) == the complex
    wrangler, for plain / rscale / dipole cases with real weights."""
    from boxtree_tpu.models.helmholtz3d import (
        Helmholtz3DPairsExpansionWrangler,
    )

    rng = np.random.default_rng(77)
    n = 900
    pts = rng.random((3, n))
    k = 3.0
    tree = build_tree(pts, max_particles_in_box=25)
    trav = build_traversal(tree)
    q = rng.standard_normal(n)

    cases = [
        {"order": 8},
        {"order": 8, "rscale": "auto"},
        {"order": 6, "dipole_vec": rng.standard_normal((3, n))},
    ]
    for kw in cases:
        ref = np.asarray(drive_fmm(
            make_helmholtz_wrangler(trav, k, pairs=False, **kw), (q,)))
        w = make_helmholtz_wrangler(trav, k, pairs=True, **kw)
        assert isinstance(w, Helmholtz3DPairsExpansionWrangler)
        pot = np.asarray(drive_fmm(w, (q,)))
        assert pot.shape == (n, 2)
        got = pot[:, 0] + 1j * pot[:, 1]
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 1e-12, (kw, err)

    # complex weights must be rejected loudly (re/im linearity is the
    # documented workaround)
    w = make_helmholtz_wrangler(trav, k, order=6, pairs=True)
    with pytest.raises(TypeError):
        drive_fmm(w, (q.astype(np.complex128),))
