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


@pytest.mark.parametrize("split", [
    pytest.param(False, marks=pytest.mark.smoke), True])
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


def test_m2l_ops_device_vs_host():
    """The device-side M2L operator builders must agree with the host
    path to machine precision (they are what makes the TPU run feasible:
    the dense table never crosses the host-device link)."""
    import jax.numpy as jnp

    from boxtree_tpu.models.laplace import (
        LaplaceTreeIndependentDataForWrangler,
    )

    rng = np.random.default_rng(7)
    for dim, order, cls_attr in ((2, 9, "Laplace2D"), (3, 6, "Laplace3D")):
        import boxtree_tpu.models.laplace as lap
        cls = getattr(lap, cls_attr + "ExpansionWrangler")
        ti = LaplaceTreeIndependentDataForWrangler(dim, order)
        w = cls.__new__(cls)              # operator hooks only
        w.order = order
        w.tree_indep = ti
        ts = rng.integers(-3, 4, (40, dim)).astype(np.float64)
        ts[np.all(np.abs(ts) < 2, axis=1)] += 3.0   # keep well-separated
        rs = rng.uniform(0.25, 2.0, 40)
        host = np.stack([w._m2l_matrix(t, float(r))
                         for t, r in zip(ts, rs)])
        dev = np.asarray(w._m2l_ops_device(jnp.asarray(ts),
                                           jnp.asarray(rs)))
        scale = np.abs(host).max(axis=(1, 2), keepdims=True)
        assert np.max(np.abs(dev - host) / scale) < 1e-12


def test_rotation_m2l_matches_dense():
    """Point-and-shoot (rotation) M2L == dense-operator M2L — the
    reference's optimized-vs-baseline equality oracle
    (test/test_fmm.py:726-794, which compares FMMLibRotationData-
    accelerated M2L against the unoptimized path to 1e-13)."""
    from boxtree_tpu.fmm import drive_fmm
    from boxtree_tpu.models.laplace import make_laplace_wrangler

    rng = np.random.default_rng(33)
    n = 1500
    pts = rng.random((3, n))
    tree = build_tree(pts, max_particles_in_box=25)
    trav = build_traversal(tree)
    q = rng.standard_normal(n)

    dense = make_laplace_wrangler(trav, order=6)
    ref = np.asarray(drive_fmm(dense, (q,)))
    rot = make_laplace_wrangler(trav, order=6, m2l_mode="rotation")
    assert rot._m2l_rot is not None
    assert rot._m2l_rot.nrotations < rot.m2l_plan.nops
    pot = np.asarray(drive_fmm(rot, (q,)))

    err = np.abs(pot - ref).max() / np.abs(ref).max()
    assert err < 1e-12, err

    # ... and the real-pair variant (pair-expanded rotation blocks)
    rotp = make_laplace_wrangler(trav, order=6, m2l_mode="rotation",
                                 pairs=True)
    assert rotp._m2l_rot is not None and rotp._m2l_rot.pairs
    potp = np.asarray(drive_fmm(rotp, (q,)))
    err = np.abs(potp - np.real(ref)).max() / np.abs(ref).max()
    assert err < 1e-12, err


@pytest.mark.parametrize("dims", [2, 3])
def test_pairs_wrangler_matches_complex(dims):
    """The complex-free real-pair wrangler == the complex wrangler
    (plain, rscale'd, per-level orders, and dipoles).  Real pairs are
    the only representation that runs on TPU backends without complex
    support (every complex op is UNIMPLEMENTED on the tunneled chip)."""
    rng = np.random.default_rng(44)
    n = 1400
    pts = rng.random((dims, n))
    tree = build_tree(pts, max_particles_in_box=25)
    trav = build_traversal(tree)
    q = rng.standard_normal(n)

    cases = [
        {"order": 6},
        {"order": 6, "rscale": "auto"},
        {"level_to_order": lambda lev: max(3, 7 - lev),
         "rscale": "auto"},
        {"order": 5, "dipole_vec": rng.standard_normal((dims, n))},
    ]
    for kw in cases:
        ref = np.asarray(drive_fmm(
            make_laplace_wrangler(trav, pairs=False, **kw), (q,)))
        w = make_laplace_wrangler(trav, pairs=True, **kw)
        assert not np.issubdtype(np.dtype(w.dtype), np.complexfloating)
        pot = np.asarray(drive_fmm(w, (q,)))
        err = np.abs(pot - np.real(ref)).max() / np.abs(ref).max()
        assert err < 1e-12, (kw, err)


def test_pairs_wrangler_distributed():
    """Real-pair wrangler through the distributed runner (the real
    coefficient blocks ride the ppermute exchange unchanged)."""
    import jax

    from boxtree_tpu.parallel.distributed import DistributedFMMRunner

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    rng = np.random.default_rng(45)
    n = 900
    pts = rng.random((3, n))
    tree = build_tree(pts, max_particles_in_box=20)
    trav = build_traversal(tree)
    q = rng.standard_normal(n)

    ref = np.asarray(drive_fmm(
        make_laplace_wrangler(trav, order=5, pairs=True), (q,)))
    runner = DistributedFMMRunner(
        4, trav,
        wrangler_factory=lambda t: make_laplace_wrangler(
            t, order=5, pairs=True))
    pot = np.asarray(runner.drive_dfmm(q))
    err = np.abs(pot - ref).max() / np.abs(ref).max()
    assert err < 1e-13, err


def test_rotation_identity_direct():
    """The point-and-shoot operator identity
    T(t) = conj(W_A)^T T(|t| z) W_S^{-T}, with the REGULAR-basis blocks
    on the local side and the IRREGULAR-basis blocks on the multipole
    side (their normalizations rotate differently — using W_A on both
    sides is wrong by O(1))."""
    import scipy.linalg as sla

    from boxtree_tpu.models.laplace import (
        Laplace3DExpansionWrangler,
        LaplaceTreeIndependentDataForWrangler,
    )
    from boxtree_tpu.models.rotation_m2l import (
        _fit_rotation_blocks,
        _rotation_to_z,
    )
    from boxtree_tpu.ops import solid_harmonics as sh

    p = 5
    ti = LaplaceTreeIndependentDataForWrangler(3, p)
    w = Laplace3DExpansionWrangler.__new__(Laplace3DExpansionWrangler)
    w.order = p
    w.tree_indep = ti

    rng = np.random.default_rng(1)
    sample = rng.standard_normal((3, 2 * p + 7))
    sample /= np.linalg.norm(sample, axis=0)
    for t in ([3.0, -2.0, 1.0], [0.0, 3.0, 0.0], [-2.0, -2.0, -2.0]):
        t = np.asarray(t)
        rz = _rotation_to_z(t / np.linalg.norm(t))
        wa = sla.block_diag(*_fit_rotation_blocks(rz, p, sample))
        ws = sla.block_diag(*_fit_rotation_blocks(
            rz, p, sample, basis=sh.irregular))
        tmat = w._m2l_matrix(t, 1.0)
        tax = w._m2l_matrix(np.array([0.0, 0.0, np.linalg.norm(t)]),
                            1.0)
        lhs = np.conj(wa).T @ tax @ np.linalg.inv(ws).T
        err = np.abs(lhs - tmat).max() / np.abs(tmat).max()
        assert err < 1e-12, (t, err)
