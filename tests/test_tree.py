"""Tree-build tests.

Ports the property-based oracles of the reference test suite
(``test/test_tree.py:86-442``): per-box containment, count identities,
leaf-weight bounds, source/target order maps — checked against brute force,
not golden files.
"""

import numpy as np
import pytest

from boxtree_tpu import build_tree, MaxLevelsExceeded, box_flags_enum
from boxtree_tpu.utils.particles import (
    make_normal_particle_array,
    make_surface_particle_array,
    make_uniform_particle_array,
)


def run_build_test(dims, nparticles, dtype, *, max_particles_in_box=None,
                   refine_weights=None, max_leaf_refine_weight=None,
                   kind="adaptive", nonuniform=False, seed=12):
    """Mirror of the reference's run_build_test (``test/test_tree.py:86-226``)."""
    if nonuniform:
        particles = make_surface_particle_array(nparticles, dims, dtype, seed)
    else:
        particles = make_normal_particle_array(nparticles, dims, dtype, seed)

    tree = build_tree(
        particles, kind=kind,
        max_particles_in_box=max_particles_in_box,
        refine_weights=refine_weights,
        max_leaf_refine_weight=max_leaf_refine_weight)

    check_tree_invariants(
        tree, particles,
        max_particles_in_box=max_particles_in_box,
        refine_weights=refine_weights,
        max_leaf_refine_weight=max_leaf_refine_weight,
        kind=kind)
    return tree


def check_tree_invariants(tree, particles, *, max_particles_in_box=None,
                          refine_weights=None, max_leaf_refine_weight=None,
                          kind="adaptive"):
    nparticles = particles.shape[1]
    sources = np.asarray(tree.sources)
    centers = np.asarray(tree.box_centers)
    levels = np.asarray(tree.box_levels)
    parents = np.asarray(tree.box_parent_ids)
    children = np.asarray(tree.box_child_ids)
    starts = np.asarray(tree.box_source_starts)
    nonchild = np.asarray(tree.box_source_counts_nonchild)
    cumul = np.asarray(tree.box_source_counts_cumul)
    flags = np.asarray(tree.box_flags)
    root_extent = float(tree.root_extent)

    if max_particles_in_box is not None:
        weights = np.ones(nparticles, dtype=np.int64)
        max_w = max_particles_in_box
    else:
        weights = np.asarray(refine_weights, dtype=np.int64)
        max_w = max_leaf_refine_weight

    # ordering round trip
    assert (sources == particles[:, np.asarray(tree.user_source_ids)]).all()

    # all particles accounted for exactly once as nonchild
    assert nonchild.sum() == nparticles
    assert cumul[0] == nparticles

    # box numbering level-major, levels consistent with parents
    assert (np.diff(levels) >= 0).all()
    assert parents[0] == 0 and levels[0] == 0
    assert (levels[parents[1:]] == levels[1:] - 1).all()

    # nonchild + sum(children cumul) == cumul (test_tree.py:141-160)
    child_sum = np.zeros(tree.nboxes, dtype=np.int64)
    for c_row in children:
        valid = c_row > 0
        child_sum[valid] += cumul[c_row[valid]]
    assert (nonchild + child_sum == cumul).all()

    # child/parent duality
    for b in range(tree.nboxes):
        for c in children[:, b]:
            if c:
                assert parents[c] == b

    # per-box containment: nonchild particles inside box extent
    tol = 4 * root_extent * np.finfo(sources.dtype).eps
    is_leaf = (children == 0).all(axis=0)
    for b in range(tree.nboxes):
        rad = root_extent / (1 << int(levels[b])) / 2
        sl = slice(int(starts[b]), int(starts[b]) + int(nonchild[b]))
        p = sources[:, sl]
        assert (p >= centers[:, b:b + 1] - rad - tol).all()
        assert (p <= centers[:, b:b + 1] + rad + tol).all()

        # leaf boxes respect the refine-weight bound
        if is_leaf[b]:
            w = weights[np.asarray(tree.user_source_ids)[sl]].sum()
            assert w <= max_w
        else:
            assert nonchild[b] == 0

    # flags consistency
    assert ((flags & box_flags_enum.IS_LEAF_BOX != 0) == is_leaf).all()
    has_src = nonchild > 0
    assert ((flags & box_flags_enum.IS_SOURCE_BOX != 0) == has_src).all()

    if kind == "non-adaptive":
        assert len(np.unique(levels[is_leaf])) == 1

    # children of a box surround the parent center
    for b in range(tree.nboxes):
        for c in children[:, b]:
            if c:
                d = np.abs(centers[:, c] - centers[:, b])
                expected = root_extent / (1 << int(levels[c])) / 2
                # centers carry absolute rounding at root-extent scale
                assert np.allclose(
                    d, expected,
                    atol=8 * root_extent * np.finfo(centers.dtype).eps)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("dims", [1, 2, 3])
def test_single_box(dtype, dims):
    # all particles fit in the root (test_tree.py:236)
    tree = run_build_test(dims, 4, dtype, max_particles_in_box=30)
    assert tree.nboxes == 1
    assert tree.nlevels == 1


@pytest.mark.parametrize("dtype", [np.float64])
@pytest.mark.parametrize("dims", [1, 2, 3])
def test_two_level(dtype, dims):
    # forces exactly one split (test_tree.py:247)
    tree = run_build_test(dims, 50, dtype, max_particles_in_box=30)
    assert tree.nlevels == 2


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("dims", [1, 2, 3])
def test_vanilla_tree(dtype, dims):
    # (test_tree.py:294)
    run_build_test(dims, 10**5, dtype, max_particles_in_box=30)


@pytest.mark.parametrize("dims", [2, 3])
def test_nonuniform_tree(dims):
    run_build_test(dims, 5 * 10**4, np.float64, max_particles_in_box=30,
                   nonuniform=True)


@pytest.mark.parametrize("dims", [2, 3])
def test_explicit_refine_weights(dims):
    # (test_tree.py:305)
    nparticles = 10**4
    rng = np.random.default_rng(10)
    refine_weights = rng.integers(1, 10, nparticles).astype(np.int32)
    particles = make_normal_particle_array(nparticles, dims, np.float64)
    tree = build_tree(particles, refine_weights=refine_weights,
                      max_leaf_refine_weight=100)
    check_tree_invariants(tree, particles, refine_weights=refine_weights,
                          max_leaf_refine_weight=100)


@pytest.mark.parametrize("dims", [1, 2, 3])
def test_non_adaptive_tree(dims):
    # (test_tree.py:325)
    run_build_test(dims, 10**4, np.float64, max_particles_in_box=30,
                   kind="non-adaptive")


@pytest.mark.parametrize("dims", [2, 3])
def test_source_target_tree(dims):
    # separate sources and targets with order-map checks (test_tree.py:341-442)
    nsources, ntargets = 2 * 10**4, 3 * 10**4
    dtype = np.float64
    sources = make_normal_particle_array(nsources, dims, dtype, seed=12)
    targets = make_uniform_particle_array(ntargets, dims, dtype, seed=19)

    tree = build_tree(sources, targets=targets, max_particles_in_box=10)

    assert not tree.sources_are_targets
    assert tree.nsources == nsources
    assert tree.ntargets == ntargets

    # ordering round trips
    assert (np.asarray(tree.sources)
            == sources[:, np.asarray(tree.user_source_ids)]).all()
    assert (np.asarray(tree.targets)[:, np.asarray(tree.sorted_target_ids)]
            == targets).all()

    # per-box counts consistent and all particles accounted
    for what, n in [("source", nsources), ("target", ntargets)]:
        nonchild = np.asarray(getattr(tree, f"box_{what}_counts_nonchild"))
        cumul = np.asarray(getattr(tree, f"box_{what}_counts_cumul"))
        assert nonchild.sum() == n
        assert cumul[0] == n

    # nonchild particles inside their boxes
    levels = np.asarray(tree.box_levels)
    centers = np.asarray(tree.box_centers)
    root_extent = float(tree.root_extent)
    for what, coords in [("source", np.asarray(tree.sources)),
                         ("target", np.asarray(tree.targets))]:
        starts = np.asarray(getattr(tree, f"box_{what}_starts"))
        nonchild = np.asarray(getattr(tree, f"box_{what}_counts_nonchild"))
        tol = 4 * root_extent * np.finfo(coords.dtype).eps
        for b in range(tree.nboxes):
            rad = root_extent / (1 << int(levels[b])) / 2
            p = coords[:, starts[b]:starts[b] + nonchild[b]]
            assert (np.abs(p - centers[:, b:b + 1]) <= rad + tol).all()

    # flag semantics for split trees
    flags = np.asarray(tree.box_flags)
    src_nonchild = np.asarray(tree.box_source_counts_nonchild)
    tgt_nonchild = np.asarray(tree.box_target_counts_nonchild)
    assert ((flags & box_flags_enum.IS_SOURCE_BOX != 0)
            == (src_nonchild > 0)).all()
    assert ((flags & box_flags_enum.IS_TARGET_BOX != 0)
            == (tgt_nonchild > 0)).all()


def test_max_levels_exceeded():
    # 11 coincident points with max 10 per box can never finish splitting
    # (test_tree.py:1103-1112)
    particles = np.zeros((2, 11), dtype=np.float64)
    particles += 0.5
    with pytest.raises(MaxLevelsExceeded):
        build_tree(particles, max_particles_in_box=10)


def test_particle_tree_order_deep():
    # particles of any box (incl. descendants) are a contiguous range
    tree = run_build_test(2, 10**4, np.float64, max_particles_in_box=5)
    starts = np.asarray(tree.box_source_starts)
    cumul = np.asarray(tree.box_source_counts_cumul)
    children = np.asarray(tree.box_child_ids)
    for b in range(tree.nboxes):
        for c in children[:, b]:
            if c:
                assert starts[b] <= starts[c]
                assert starts[c] + cumul[c] <= starts[b] + cumul[b]


def test_box_id_of_source_extension():
    tree = run_build_test(3, 10**4, np.float64, max_particles_in_box=30)
    box_of = np.asarray(tree.box_id_of_source)
    starts = np.asarray(tree.box_source_starts)
    nonchild = np.asarray(tree.box_source_counts_nonchild)
    for b in range(tree.nboxes):
        assert (box_of[starts[b]:starts[b] + nonchild[b]] == b).all()
