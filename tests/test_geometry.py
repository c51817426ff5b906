"""Geometric query + level restriction tests.

Ports the reference oracles: area query vs brute force over leaves
(``test/test_tree.py:730-769``), leaves-to-balls vs brute-force l-inf
distances (``:672-723``), space-invader reconstruction (``:985-1041``),
and level restriction checked with an area query (``:904-974``).
"""

import numpy as np
import pytest

from boxtree_tpu import build_tree, box_flags_enum
from boxtree_tpu.geometry.area_query import (
    AreaQueryBuilder,
    LeavesToBallsLookupBuilder,
    PeerListFinder,
    SpaceInvaderQueryBuilder,
)
from boxtree_tpu.utils.particles import (
    make_normal_particle_array,
    make_surface_particle_array,
)


def _leaf_geometry(tree):
    levels = np.asarray(tree.box_levels)
    centers = np.asarray(tree.box_centers)
    flags = np.asarray(tree.box_flags)
    is_leaf = (flags & box_flags_enum.IS_LEAF_BOX) != 0
    rad = float(tree.root_extent) / (1 << (levels + 1)).astype(np.float64)
    return centers, rad, np.nonzero(is_leaf)[0]


def brute_force_area_query(tree, ball_centers, ball_radii):
    centers, rad, leaves = _leaf_geometry(tree)
    out = []
    for i in range(ball_centers.shape[1]):
        dist = np.max(np.abs(centers[:, leaves]
                             - ball_centers[:, i:i + 1]), axis=0)
        out.append(set(leaves[dist <= rad[leaves] + ball_radii[i]]))
    return out


@pytest.mark.parametrize("dims", [2, 3])
def test_area_query(dims):
    rng = np.random.default_rng(10)
    nparticles, nballs = 10**4, 300
    particles = make_normal_particle_array(nparticles, dims, np.float64)
    tree = build_tree(particles, max_particles_in_box=30)

    ball_centers = rng.uniform(-1, 1, (dims, nballs))
    ball_radii = rng.uniform(0.0, 0.4, nballs)

    aq = AreaQueryBuilder()(tree, ball_centers, ball_radii)
    starts = np.asarray(aq.leaves_near_ball_starts)
    lists = np.asarray(aq.leaves_near_ball_lists)

    expected = brute_force_area_query(tree, ball_centers, ball_radii)
    for i in range(nballs):
        got = set(lists[starts[i]:starts[i + 1]])
        assert got == expected[i], (i, got ^ expected[i])


def test_area_query_balls_outside_bbox():
    # mirror test_tree.py:802-834
    rng = np.random.default_rng(11)
    particles = make_normal_particle_array(5000, 2, np.float64)
    tree = build_tree(particles, max_particles_in_box=20)
    ball_centers = rng.uniform(-10, 10, (2, 100))
    ball_radii = rng.uniform(0, 5.0, 100)
    aq = AreaQueryBuilder()(tree, ball_centers, ball_radii)
    starts = np.asarray(aq.leaves_near_ball_starts)
    lists = np.asarray(aq.leaves_near_ball_lists)
    expected = brute_force_area_query(tree, ball_centers, ball_radii)
    for i in range(100):
        assert set(lists[starts[i]:starts[i + 1]]) == expected[i]


@pytest.mark.parametrize("dims", [2, 3])
def test_leaves_to_balls_lookup(dims):
    rng = np.random.default_rng(12)
    particles = make_normal_particle_array(8000, dims, np.float64)
    tree = build_tree(particles, max_particles_in_box=30)
    nballs = 200
    ball_centers = rng.uniform(-1, 1, (dims, nballs))
    ball_radii = rng.uniform(0, 0.3, nballs)

    lbl = LeavesToBallsLookupBuilder()(tree, ball_centers, ball_radii)
    starts = np.asarray(lbl.balls_near_box_starts)
    lists = np.asarray(lbl.balls_near_box_lists)

    centers, rad, leaves = _leaf_geometry(tree)
    for b in range(tree.nboxes):
        got = set(lists[starts[b]:starts[b + 1]])
        if b in set(leaves):
            dist = np.max(np.abs(ball_centers - centers[:, b:b + 1]),
                          axis=0)
            expected = set(np.nonzero(dist <= rad[b] + ball_radii)[0])
        else:
            expected = set()
        assert got == expected, b


def test_space_invader_query():
    # oracle: reconstruct from leaves-to-balls (test_tree.py:985-1041)
    rng = np.random.default_rng(13)
    particles = make_normal_particle_array(8000, 2, np.float64)
    tree = build_tree(particles, max_particles_in_box=30)
    nballs = 200
    ball_centers = rng.uniform(-1, 1, (2, nballs))
    ball_radii = rng.uniform(0, 0.3, nballs)

    si = np.asarray(SpaceInvaderQueryBuilder()(
        tree, ball_centers, ball_radii))

    lbl = LeavesToBallsLookupBuilder()(tree, ball_centers, ball_radii)
    starts = np.asarray(lbl.balls_near_box_starts)
    lists = np.asarray(lbl.balls_near_box_lists)
    centers = np.asarray(tree.box_centers)
    expected = np.zeros(tree.nboxes, np.float32)
    for b in range(tree.nboxes):
        balls = lists[starts[b]:starts[b + 1]]
        if len(balls):
            expected[b] = np.max(np.max(np.abs(
                ball_centers[:, balls] - centers[:, b:b + 1]), axis=0))
    assert np.allclose(si, expected, rtol=1e-6)


@pytest.mark.parametrize("dims", [2])
def test_peer_lists(dims):
    particles = make_normal_particle_array(4000, dims, np.float64)
    tree = build_tree(particles, max_particles_in_box=30)
    pl = PeerListFinder()(tree)
    starts = np.asarray(pl.peer_list_starts)
    lists = np.asarray(pl.peer_lists)

    levels = np.asarray(tree.box_levels)
    centers = np.asarray(tree.box_centers)
    children = np.asarray(tree.box_child_ids)
    root_extent = float(tree.root_extent)

    def adjacent(a, b):
        ra = root_extent / (1 << (levels[a] + 1))
        rb = root_extent / (1 << (levels[b] + 1))
        d = np.max(np.abs(centers[:, a] - centers[:, b]))
        return d <= ra + rb + min(ra, rb) * 1e-9 + (ra + rb) * 1e-12 \
            or d <= ra + rb

    for b in range(min(tree.nboxes, 300)):
        peers = lists[starts[b]:starts[b + 1]]
        # peers are adjacent, at level <= level(b)
        for p in peers:
            assert levels[p] <= levels[b]
            assert adjacent(b, p)
        # same-level adjacent boxes must all be present
        same = [o for o in range(tree.nboxes)
                if levels[o] == levels[b] and adjacent(b, o)]
        assert set(same) <= set(peers)


@pytest.mark.parametrize("dims", [2, 3])
def test_level_restriction(dims):
    # level-restriction checked geometrically (test_tree.py:904-974)
    nparticles = 10**4
    particles = make_surface_particle_array(nparticles, dims, np.float64)
    tree = build_tree(particles, kind="adaptive-level-restricted",
                      max_particles_in_box=10)

    centers, rad, leaves = _leaf_geometry(tree)
    levels = np.asarray(tree.box_levels)
    # area query with each leaf's slightly-enlarged box as the ball
    aq = AreaQueryBuilder()(
        tree, centers[:, leaves], rad[leaves] * (1 + 1e-9))
    starts = np.asarray(aq.leaves_near_ball_starts)
    lists = np.asarray(aq.leaves_near_ball_lists)
    for i, leaf in enumerate(leaves):
        neighbors = lists[starts[i]:starts[i + 1]]
        assert (np.abs(levels[neighbors] - levels[leaf]) <= 1).all()


def test_area_query_elementwise_custom():
    """Custom query through the reusable elementwise mechanism
    (the analogue of instantiating AreaQueryElementwiseTemplate,
    boxtree/area_query.py:495-610): per ball, accumulate the number of
    overlapping leaves AND the sum of their box radii; brute-force
    oracle."""
    import jax.numpy as jnp

    from boxtree_tpu.geometry import AreaQueryBuilder, area_query_elementwise

    rng = np.random.default_rng(29)
    particles = make_normal_particle_array(5000, 2, np.float64)
    tree = build_tree(particles, max_particles_in_box=25)
    nballs = 150
    centers_h = rng.uniform(-1, 1, (2, nballs))
    radii_h = rng.uniform(0, 0.25, nballs)
    centers = jnp.asarray(centers_h)
    radii = jnp.asarray(radii_h)
    root = float(np.asarray(tree.root_extent))
    levels = tree.box_levels

    def gen(idx):
        # ball generator hook: scale the stored radii per ball parity
        return centers, radii * jnp.where(idx % 2 == 0, 1.0, 0.5)

    def leaf_found_op(balls, leaves):
        # value = leaf box radius; scatter to the owning ball
        return root / (2.0 ** (levels[leaves].astype(jnp.float64) + 1)), \
            balls

    radius_sum = np.asarray(area_query_elementwise(
        tree, gen, nballs, leaf_found_op,
        jnp.zeros(nballs, jnp.float64), combine="add"))
    count = np.asarray(area_query_elementwise(
        tree, gen, nballs, lambda b, le: (jnp.ones_like(b), b),
        jnp.zeros(nballs, jnp.int64), combine="add"))

    # oracle via the plain area query at the modified radii
    radii_mod = radii_h * np.where(np.arange(nballs) % 2 == 0, 1.0, 0.5)
    aq = AreaQueryBuilder()(tree, centers_h, radii_mod)
    starts = np.asarray(aq.leaves_near_ball_starts)
    lists = np.asarray(aq.leaves_near_ball_lists)
    lev_h = np.asarray(tree.box_levels)
    for i in range(nballs):
        leaves = lists[starts[i]:starts[i + 1]]
        assert count[i] == len(leaves), i
        ref = np.sum(root / 2.0 ** (lev_h[leaves] + 1.0))
        assert abs(radius_sum[i] - ref) < 1e-12, i
