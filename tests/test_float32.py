"""float32 end-to-end FMM tests (mirror ``test/test_fmm.py:672-719``)
plus a reduced-precision (complex64) Laplace wrangler check."""

import numpy as np
import pytest

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.traversal import build_traversal
from boxtree_tpu.utils.particles import make_normal_particle_array


@pytest.mark.parametrize("enable_extents", [True, False])
def test_fmm_float32(enable_extents):
    # counting FMM over a float32 tree must be exact (ref
    # test/test_fmm.py:672-719, incl. the with-extents flavor)
    from boxtree_tpu.models.constant_one import (
        ConstantOneExpansionWrangler,
        ConstantOneTreeIndependentDataForWrangler,
    )
    from boxtree_tpu.traversal import merge_close_lists

    dims = 2
    nsources = ntargets = 1000
    dtype = np.float32
    sources = make_normal_particle_array(nsources, dims, dtype, seed=15)
    targets = make_normal_particle_array(ntargets, dims, dtype, seed=15)
    rng = np.random.default_rng(12)
    target_radii = (2.0 ** rng.uniform(-10, 0, ntargets)).astype(dtype) \
        if enable_extents else None

    tree = build_tree(sources, targets=targets, max_particles_in_box=30,
                      target_radii=target_radii, stick_out_factor=0.25)
    assert tree.sources.dtype == dtype
    trav = build_traversal(tree)
    if enable_extents:
        trav = merge_close_lists(trav)

    w = ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav)
    pot = np.asarray(drive_fmm(w, (np.ones(nsources),)))
    assert (pot == nsources).all()


def test_fmm_laplace3d_complex64():
    # 3D Laplace with float32 particles + complex64 expansions: rel err
    # vs float64 direct summation within single-precision headroom
    from boxtree_tpu.models.laplace import (
        Laplace3DExpansionWrangler,
        LaplaceTreeIndependentDataForWrangler,
    )

    rng = np.random.default_rng(44)
    n = 1500
    pts32 = rng.random((3, n)).astype(np.float32)
    tree = build_tree(pts32, max_particles_in_box=30)
    trav = build_traversal(tree)
    q = rng.standard_normal(n)

    w = Laplace3DExpansionWrangler(
        LaplaceTreeIndependentDataForWrangler(3, 6), trav,
        dtype=np.complex64)
    pot = np.asarray(drive_fmm(w, (q,)))
    assert pot.dtype == np.complex64

    # direct sum in float64 at the float32 particle positions
    p64 = pts32.astype(np.float64)
    d = p64[:, :, None] - p64[:, None, :]
    r = np.sqrt((d * d).sum(axis=0))
    np.fill_diagonal(r, np.inf)
    ref = (q[None, :] / r).sum(axis=1)

    err = np.abs(pot.real - ref).max() / np.abs(ref).max()
    assert err < 2e-3, err
