"""Native Laplace FMM vs direct summation (mirrors the reference's
pyfmmlib accuracy oracle, ``test/test_fmm.py:398-476``: rel l-inf error
below 1e-5 against direct evaluation)."""

import numpy as np
import pytest

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.laplace import make_laplace_wrangler
from boxtree_tpu.traversal import build_traversal


def direct_log_potential(targets, sources, charges):
    dx = targets[0][:, None] - sources[0][None, :]
    dy = targets[1][:, None] - sources[1][None, :]
    r2 = dx * dx + dy * dy
    g = 0.5 * np.log(np.where(r2 > 0, r2, 1.0))
    g[r2 == 0] = 0.0
    return g @ charges


@pytest.mark.parametrize("split", [False, True])
@pytest.mark.parametrize("well_sep_is_n_away", [1, 2])
def test_laplace2d_vs_direct(split, well_sep_is_n_away):
    rng = np.random.default_rng(20)
    nsources = 2500
    sources = rng.random((2, nsources))
    # cluster some sources to force an adaptive tree
    sources[:, :600] = 0.1 * rng.random((2, 600)) + 0.45
    charges = rng.standard_normal(nsources)

    if split:
        ntargets = 1800
        targets = rng.random((2, ntargets))
    else:
        ntargets = nsources
        targets = None

    tree = build_tree(sources, targets=targets, max_particles_in_box=20)
    trav = build_traversal(tree, well_sep_is_n_away=well_sep_is_n_away)

    wrangler = make_laplace_wrangler(trav, order=20)
    pot = np.asarray(drive_fmm(wrangler, (charges,))).real

    tgt = targets if split else sources
    ref = direct_log_potential(tgt, sources, charges)

    rel_err = np.max(np.abs(pot - ref)) / np.max(np.abs(ref))
    assert rel_err < 1e-5, rel_err


def direct_coulomb(targets, sources, charges):
    diff = targets[:, :, None] - sources[:, None, :]
    r2 = (diff * diff).sum(axis=0)
    g = np.where(r2 > 0, 1.0 / np.sqrt(np.where(r2 > 0, r2, 1.0)), 0.0)
    return g @ charges


@pytest.mark.parametrize("split", [False, True])
def test_laplace3d_vs_direct(split):
    rng = np.random.default_rng(31)
    nsources = 2000
    # sphere-surface sources (nonuniform, like the reference's Config D)
    v = rng.standard_normal((3, nsources))
    sources = v / np.linalg.norm(v, axis=0)
    charges = rng.standard_normal(nsources)

    if split:
        ntargets = 1200
        targets = rng.random((3, ntargets)) * 2 - 1
    else:
        targets = None

    tree = build_tree(sources, targets=targets, max_particles_in_box=30)
    trav = build_traversal(tree)

    wrangler = make_laplace_wrangler(trav, order=12)
    pot = np.asarray(drive_fmm(wrangler, (charges,))).real

    tgt = targets if split else sources
    ref = direct_coulomb(tgt, sources, charges)
    rel_err = np.max(np.abs(pot - ref)) / np.max(np.abs(ref))
    assert rel_err < 1e-5, rel_err


def test_laplace2d_dipoles_vs_direct():
    """Dipole sources (mirrors the reference's use_dipoles rows,
    ``test/test_fmm.py:398-476``): pot = w (d . grad_y) log|x - y|."""
    rng = np.random.default_rng(44)
    nsources, ntargets = 2000, 1500
    sources = rng.random((2, nsources))
    targets = rng.random((2, ntargets))
    weights = rng.standard_normal(nsources)
    dipole_vec = rng.standard_normal((2, nsources))

    tree = build_tree(sources, targets=targets, max_particles_in_box=20)
    trav = build_traversal(tree)
    wrangler = make_laplace_wrangler(trav, order=20,
                                     dipole_vec=dipole_vec)
    pot = np.asarray(drive_fmm(wrangler, (weights,))).real

    # direct: (d . grad_y) log|x-y| = d . (y - x) / |x-y|^2
    diff = sources[:, None, :] - targets[:, :, None]     # (2, nt, ns)
    r2 = (diff * diff).sum(axis=0)
    ref = ((dipole_vec[:, None, :] * diff).sum(axis=0) / r2) @ weights

    rel_err = np.max(np.abs(pot - ref)) / np.max(np.abs(ref))
    assert rel_err < 1e-5, rel_err


def test_laplace3d_dipoles_vs_direct():
    """3D dipoles: pot = w (d . grad_y) 1/|x-y| = w d.(x-y)/|x-y|^3."""
    rng = np.random.default_rng(45)
    nsources, ntargets = 1500, 1000
    v = rng.standard_normal((3, nsources))
    sources = v / np.linalg.norm(v, axis=0)
    targets = rng.random((3, ntargets)) * 2 - 1
    weights = rng.standard_normal(nsources)
    dipole_vec = rng.standard_normal((3, nsources))

    tree = build_tree(sources, targets=targets, max_particles_in_box=30)
    trav = build_traversal(tree)
    wrangler = make_laplace_wrangler(trav, order=12,
                                     dipole_vec=dipole_vec)
    pot = np.asarray(drive_fmm(wrangler, (weights,))).real

    diff = targets[:, :, None] - sources[:, None, :]     # (3, nt, ns)
    r3 = ((diff * diff).sum(axis=0)) ** 1.5
    ref = ((dipole_vec[:, None, :] * diff).sum(axis=0) / r3) @ weights

    rel_err = np.max(np.abs(pot - ref)) / np.max(np.abs(ref))
    assert rel_err < 1e-5, rel_err
