"""Deep-tree numerical stability of the rscaled Laplace wranglers.

Mirrors ``test/test_fmm.py:535-610`` (test_pyfmmlib_numerical_stability):
particles spaced geometrically along a line force a 15+-level tree; at
order 35 the unscaled expansions would overflow/underflow, so passing the
reference's error bound — rel err < (1/2)^(p+1) in 2D, (3/4)^(p+1) in
3D — requires the per-level rscale normalization
(``boxtree/pyfmmlib_integration.py:393-402``).
"""

import jax
import numpy as np
import pytest

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.laplace import make_laplace_wrangler
from boxtree_tpu.traversal import build_traversal


@pytest.fixture(autouse=True)
def _clear_caches():
    # each parametrization compiles one-off deep-tree programs
    yield
    jax.clear_caches()


@pytest.mark.parametrize("dims,order", [(2, 35), (3, 31)])
def test_laplace_numerical_stability(dims, order):
    nsources = 30
    dtype = np.float64

    # geometrically increasing/decreasing spacing along a line
    # (test_fmm.py:546-549): builds a degenerate, very deep tree
    particle_line = np.array([2.0 ** -i for i in range(nsources // 2)],
                             dtype=dtype)
    particle_line = np.hstack([particle_line, 3 - particle_line])
    zero = np.zeros(nsources, dtype)
    sources = np.vstack([particle_line, zero, zero])[:dims]
    targets = sources * (1 + 1e-3)

    tree = build_tree(sources, targets=targets, max_particles_in_box=2)
    assert tree.nlevels >= 15
    trav = build_traversal(tree)

    weights = np.ones(nsources)
    wrangler = make_laplace_wrangler(trav, order=order, rscale="auto")
    pot = np.asarray(drive_fmm(wrangler, (weights,))).real
    assert not np.isnan(pot).any()

    # direct reference
    d = sources[:, None, :] - targets[:, :, None]
    r2 = (d * d).sum(axis=0)
    if dims == 2:
        g = 0.5 * np.log(r2)
    else:
        g = 1.0 / np.sqrt(r2)
    ref = g @ weights

    rel_err = np.abs(pot - ref).max() / np.abs(ref).max()
    bound = (1 / 2) ** (1 + order) if dims == 2 else (3 / 4) ** (1 + order)
    assert rel_err < bound, rel_err


def _line_tree(dims, nsources=30):
    dtype = np.float64
    particle_line = np.array([2.0 ** -i for i in range(nsources // 2)],
                             dtype=dtype)
    particle_line = np.hstack([particle_line, 3 - particle_line])
    zero = np.zeros(nsources, dtype)
    sources = np.vstack([particle_line, zero, zero])[:dims]
    targets = sources * (1 + 1e-3)
    tree = build_tree(sources, targets=targets, max_particles_in_box=2)
    assert tree.nlevels >= 15
    return sources, targets, tree


@pytest.mark.parametrize("dims,order", [(2, 35), (3, 15)])
def test_helmholtz_numerical_stability(dims, order):
    """Helmholtz leg of the reference stability test
    (``test/test_fmm.py:535-610``, helmholtz_k=2): the deep line tree
    drives k * box_size to ~1e-4, where the unscaled M2L operator build
    (H_70 at that argument ~ 1e399) overflows float64 outright — this
    passes only with the per-level rscale machinery.  3D runs at a
    reduced order (the dense Gaunt tensor is O(p^5) memory) with the
    correspondingly looser (3/4)^(p+1) reference bound."""
    from boxtree_tpu.models.helmholtz3d import make_helmholtz_wrangler

    k = 2.0
    sources, targets, tree = _line_tree(dims)
    trav = build_traversal(tree)
    weights = np.ones(sources.shape[1])

    wrangler = make_helmholtz_wrangler(trav, helmholtz_k=k, order=order,
                                       rscale="auto")
    pot = np.asarray(drive_fmm(wrangler, (weights,)))
    assert not np.isnan(pot).any()

    d = sources[:, None, :] - targets[:, :, None]
    r = np.sqrt((d * d).sum(axis=0))
    if dims == 2:
        from scipy import special as sp
        g = 0.25j * sp.hankel1(0, k * r)
    else:
        g = np.exp(1j * k * r) / r
    ref = g @ weights

    rel_err = np.abs(pot - ref).max() / np.abs(ref).max()
    bound = (1 / 2) ** (1 + order) if dims == 2 else (3 / 4) ** (1 + order)
    assert rel_err < bound, rel_err


def test_level_to_order():
    # level-varying orders run end-to-end and stay accurate (mirrors
    # the level_to_order use in test_fmm.py:398-476)
    rng = np.random.default_rng(4)
    n = 500
    pts = rng.random((2, n))
    tree = build_tree(pts, max_particles_in_box=20)
    trav = build_traversal(tree)
    q = rng.standard_normal(n)

    wrangler = make_laplace_wrangler(
        trav, level_to_order=lambda lev: 20 - min(lev, 4), rscale="auto")
    pot = np.asarray(drive_fmm(wrangler, (q,))).real

    d = pts[:, :, None] - pts[:, None, :]
    r2 = (d * d).sum(axis=0)
    g = 0.5 * np.log(np.where(r2 > 0, r2, 1.0))
    ref = g @ q
    rel_err = np.abs(pot - ref).max() / np.abs(ref).max()
    assert rel_err < 1e-6, rel_err
