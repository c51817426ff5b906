"""FMM correctness tests.

The central oracle is the reference's constant-one completeness test
(``test/test_fmm.py:141-392``): with the kernel identically 1 and unit
weights, every target potential must equal ``nsources`` *exactly* — which
verifies that Lists 1-4 cover every (target, source) pair exactly once.
"""

import numpy as np
import pytest

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.constant_one import (
    ConstantOneExpansionWrangler,
    ConstantOneTreeIndependentDataForWrangler,
)
from boxtree_tpu.traversal import build_traversal
from boxtree_tpu.utils.particles import (
    make_normal_particle_array,
    make_surface_particle_array,
    make_uniform_particle_array,
)


def run_completeness(dims, nsources, ntargets, *, nonuniform=False,
                     well_sep_is_n_away=1, max_particles_in_box=30,
                     kind="adaptive", seed=44):
    if nonuniform:
        sources = make_surface_particle_array(
            nsources, dims, np.float64, seed)
    else:
        sources = make_normal_particle_array(nsources, dims, np.float64, seed)

    if ntargets is None:
        targets = None
    else:
        targets = make_uniform_particle_array(
            ntargets, dims, np.float64, seed + 1)

    tree = build_tree(sources, targets=targets, kind=kind,
                      max_particles_in_box=max_particles_in_box)
    trav = build_traversal(tree, well_sep_is_n_away=well_sep_is_n_away)

    wrangler = ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav)
    weights = np.ones(nsources, dtype=np.float64)
    pot = np.asarray(drive_fmm(wrangler, (weights,)))

    assert pot.shape == (tree.ntargets,)
    # exact equality, like the reference oracle (test_fmm.py:388-391)
    assert (pot == nsources).all(), \
        f"{(pot != nsources).sum()} targets mismatched; " \
        f"range [{pot.min()}, {pot.max()}], expected {nsources}"
    return trav


@pytest.mark.parametrize("dims", [1, 2, 3])
@pytest.mark.parametrize("nsources_ntargets", [
    (1500, None),
    # smoke tier: one split-src/tgt completeness case per dim
    pytest.param((1000, 1500), marks=pytest.mark.smoke),
])
def test_fmm_completeness(dims, nsources_ntargets):
    nsources, ntargets = nsources_ntargets
    run_completeness(dims, nsources, ntargets)


@pytest.mark.parametrize("dims", [2, 3])
def test_fmm_completeness_nonuniform(dims):
    run_completeness(dims, 1500, 1000, nonuniform=True,
                     max_particles_in_box=10)


@pytest.mark.parametrize("dims", [2, 3])
def test_fmm_completeness_2_away(dims):
    run_completeness(dims, 1200, None, well_sep_is_n_away=2)


@pytest.mark.parametrize("dims", [2])
def test_fmm_completeness_non_adaptive(dims):
    run_completeness(dims, 1500, None, kind="non-adaptive")


def test_fmm_completeness_small_and_shallow():
    # single-box tree: everything flows through list 1
    run_completeness(2, 20, None)
    run_completeness(2, 40, 40)


@pytest.mark.parametrize("filter_kind", ["user", "tree"])
def test_fmm_completeness_filtered_targets(filter_kind):
    """Constant-one completeness with target filtering (mirrors the
    reference's filter_kind rows, ``test/test_fmm.py:246-310``): flagged
    targets get exactly nsources, filtered-out targets get 0."""
    from boxtree_tpu.tree.filtering import ParticleListFilter
    from boxtree_tpu.models.constant_one import (
        ConstantOneExpansionWranglerWithFilteredTargetsInTreeOrder,
        ConstantOneExpansionWranglerWithFilteredTargetsInUserOrder,
    )

    rng = np.random.default_rng(17)
    dims, nsources, ntargets = 2, 2500, 2000
    sources = make_normal_particle_array(nsources, dims, np.float64, 3)
    targets = make_uniform_particle_array(ntargets, dims, np.float64, 4)
    tree = build_tree(sources, targets=targets, max_particles_in_box=30)
    trav = build_traversal(tree)
    flags = rng.integers(0, 2, ntargets).astype(np.int8)

    plfilt = ParticleListFilter()
    ti = ConstantOneTreeIndependentDataForWrangler()
    if filter_kind == "user":
        ft = plfilt.filter_target_lists_in_user_order(tree, flags)
        wrangler = \
            ConstantOneExpansionWranglerWithFilteredTargetsInUserOrder(
                ti, trav, ft)
    else:
        ft = plfilt.filter_target_lists_in_tree_order(tree, flags)
        wrangler = \
            ConstantOneExpansionWranglerWithFilteredTargetsInTreeOrder(
                ti, trav, ft)

    pot = np.asarray(drive_fmm(wrangler, [np.ones(nsources)]))
    assert pot.shape == (ntargets,)
    assert (pot[flags > 0] == nsources).all()
    assert (pot[flags == 0] == 0).all()
