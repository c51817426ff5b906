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
