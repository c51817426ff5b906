"""2D Helmholtz FMM vs direct summation (mirrors the reference's
pyfmmlib Helmholtz oracle, ``test/test_fmm.py:398-528``)."""

import numpy as np
import pytest

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.helmholtz import make_helmholtz_wrangler
from boxtree_tpu.traversal import build_traversal


def direct_helmholtz(targets, sources, charges, k):
    from scipy import special as sp
    dx = targets[0][:, None] - sources[0][None, :]
    dy = targets[1][:, None] - sources[1][None, :]
    r = np.sqrt(dx * dx + dy * dy)
    g = np.where(r > 0, 0.25j * sp.hankel1(0, k * np.where(r > 0, r, 1)),
                 0)
    return g @ charges


@pytest.mark.parametrize("split", [False, True])
def test_helmholtz2d_vs_direct(split):
    rng = np.random.default_rng(23)
    k = 3.0
    nsources = 1500
    sources = rng.random((2, nsources))
    sources[:, :400] = 0.1 * rng.random((2, 400)) + 0.4  # clustering
    charges = rng.standard_normal(nsources) \
        + 1j * rng.standard_normal(nsources)

    if split:
        targets = rng.random((2, 1000))
    else:
        targets = None

    tree = build_tree(sources, targets=targets, max_particles_in_box=20)
    trav = build_traversal(tree)
    wrangler = make_helmholtz_wrangler(trav, helmholtz_k=k, order=16)
    pot = np.asarray(drive_fmm(wrangler, (charges,)))

    tgt = targets if split else sources
    ref = direct_helmholtz(tgt, sources, charges, k)
    rel = np.max(np.abs(pot - ref)) / np.max(np.abs(ref))
    assert rel < 1e-5, rel


def test_helmholtz2d_dipoles_vs_direct():
    """Dipole sources: pot = w (d . grad_y)(i/4) H_0(k|x-y|)
    = w (i/4) k H_1(k r) d.(x-y)/r (the JVP-of-hooks dipole path with the
    differentiable Bessel callback)."""
    from scipy import special as sp

    rng = np.random.default_rng(29)
    k = 3.0
    nsources, ntargets = 1200, 900
    sources = rng.random((2, nsources))
    targets = rng.random((2, ntargets))
    weights = rng.standard_normal(nsources) \
        + 1j * rng.standard_normal(nsources)
    dipole_vec = rng.standard_normal((2, nsources))

    tree = build_tree(sources, targets=targets, max_particles_in_box=20)
    trav = build_traversal(tree)
    wrangler = make_helmholtz_wrangler(trav, helmholtz_k=k, order=16,
                                       dipole_vec=dipole_vec)
    pot = np.asarray(drive_fmm(wrangler, (weights,)))

    diff = targets[:, :, None] - sources[:, None, :]     # (2, nt, ns)
    r = np.sqrt((diff * diff).sum(axis=0))
    proj = (dipole_vec[:, None, :] * diff).sum(axis=0) / r
    ref = (0.25j * k * sp.hankel1(1, k * r) * proj) @ weights

    rel = np.max(np.abs(pot - ref)) / np.max(np.abs(ref))
    assert rel < 1e-5, rel


def test_cylindrical_bessel_vs_scipy():
    """Native J_n/Y_n recurrences vs scipy over the FMM's argument range
    (mirrors tests/test_helmholtz3d.py's spherical oracle)."""
    from scipy import special as sp

    from boxtree_tpu.ops.cylinder_bessel import cylindrical_jy, miller_start

    rng = np.random.default_rng(3)
    p = 24
    x = np.concatenate([
        rng.uniform(1e-6, 0.5, 50),
        rng.uniform(0.5, 5.0, 100),
        rng.uniform(5.0, 40.0, 100),
        sp.jn_zeros(0, 3),               # near-zeros of J_0 regression
    ])
    j_dev, y_dev = cylindrical_jy(x, p, nstart=miller_start(p, 40.0))
    ns = np.arange(p + 1)[None, :]
    j_ref = sp.jv(ns, x[:, None])
    y_ref = sp.yv(ns, x[:, None])
    assert np.max(np.abs(np.asarray(j_dev) - j_ref)) < 1e-12
    # Y grows steeply at small x / high order: compare relatively
    rel = np.abs(np.asarray(y_dev) - y_ref) / np.maximum(
        np.abs(y_ref), 1.0)
    assert np.max(rel) < 1e-11, np.max(rel)


def test_helmholtz2d_rscale_vs_unscaled():
    """rscale="auto" must reproduce the unscaled result (same FMM, a
    diagonal change of basis) and stay accurate vs direct — covers the
    scaled host operators AND the scaled device basis hooks at once."""
    rng = np.random.default_rng(11)
    k = 3.0
    n = 600
    sources = rng.random((2, n))
    charges = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    tree = build_tree(sources, max_particles_in_box=12)
    trav = build_traversal(tree)

    pots = []
    for rscale in (None, "auto"):
        w = make_helmholtz_wrangler(trav, helmholtz_k=k, order=12,
                                    rscale=rscale)
        pots.append(np.asarray(drive_fmm(w, (charges,))))
    ref = direct_helmholtz(sources, sources, charges, k)
    scale = np.abs(ref).max()
    assert np.abs(pots[0] - pots[1]).max() / scale < 1e-10
    assert np.abs(pots[1] - ref).max() / scale < 1e-5


def test_helmholtz2d_rscale_dipoles():
    """Dipole JVP path through the rscaled basis hooks."""
    from scipy import special as sp

    rng = np.random.default_rng(12)
    k = 2.0
    n = 400
    sources = rng.random((2, n))
    weights = rng.standard_normal(n)
    dipvec = rng.standard_normal((2, n))
    tree = build_tree(sources, max_particles_in_box=10)
    trav = build_traversal(tree)
    w = make_helmholtz_wrangler(trav, helmholtz_k=k, order=14,
                                rscale="auto", dipole_vec=dipvec)
    pot = np.asarray(drive_fmm(w, (weights,)))

    dx = sources[0][:, None] - sources[0][None, :]
    dy = sources[1][:, None] - sources[1][None, :]
    r = np.sqrt(dx * dx + dy * dy)
    rs = np.where(r > 0, r, 1.0)
    # (dipvec . grad_src) G = (i k / 4) H_1(k r) (d . rhat_src)
    proj = (dx * dipvec[0][None, :] + dy * dipvec[1][None, :]) / rs
    g = np.where(r > 0, 0.25j * k * sp.hankel1(1, k * rs) * proj, 0)
    ref = g @ weights
    rel = np.max(np.abs(pot - ref)) / np.max(np.abs(ref))
    assert rel < 1e-5, rel


def test_helmholtz2d_pairs_matches_complex():
    """The complex-free real-pair 2D wrangler == the complex wrangler
    (plain / rscale / dipoles, real weights; potentials come back as
    (ntargets, 2) [re, im] lanes)."""
    from boxtree_tpu.models.helmholtz3d import make_helmholtz_wrangler

    rng = np.random.default_rng(88)
    n = 1100
    pts = rng.random((2, n))
    k = 4.0
    tree = build_tree(pts, max_particles_in_box=20)
    trav = build_traversal(tree)
    q = rng.standard_normal(n)

    cases = [
        {"order": 10},
        {"order": 10, "rscale": "auto"},
        {"order": 8, "dipole_vec": rng.standard_normal((2, n))},
    ]
    for kw in cases:
        ref = np.asarray(drive_fmm(
            make_helmholtz_wrangler(trav, k, pairs=False, **kw), (q,)))
        w = make_helmholtz_wrangler(trav, k, pairs=True, **kw)
        pot = np.asarray(drive_fmm(w, (q,)))
        assert pot.shape == (n, 2)
        got = pot[:, 0] + 1j * pot[:, 1]
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 1e-12, (kw, err)
