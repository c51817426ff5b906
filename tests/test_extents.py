"""Extent-tree tests (mirror ``test/test_tree.py:451-633``): particles
with radii are sorted so they never stick out of their (stick-out-
enlarged) box, and the per-box particle bounding boxes contain every
subtree particle with its radius."""

import numpy as np
import pytest

from boxtree_tpu import build_tree
from boxtree_tpu.utils.particles import (
    make_normal_particle_array,
    make_uniform_particle_array,
)


@pytest.mark.parametrize("extent_norm", ["linf", "l2"])
@pytest.mark.parametrize("dims", [2, 3])
def test_extent_tree(dims, extent_norm):
    rng = np.random.default_rng(51)
    nsources, ntargets = 3000, 2500
    sources = make_normal_particle_array(nsources, dims, np.float64, 1)
    targets = make_uniform_particle_array(ntargets, dims, np.float64, 2)
    source_radii = 2 ** rng.uniform(-10, 0, nsources) * 0.01
    target_radii = 2 ** rng.uniform(-10, 0, ntargets) * 0.01
    sof = 0.25

    tree = build_tree(
        sources, targets=targets, source_radii=source_radii,
        target_radii=target_radii, stick_out_factor=sof,
        extent_norm=extent_norm, max_particles_in_box=20)

    assert tree.sources_have_extent and tree.targets_have_extent
    assert tree.extent_norm == extent_norm

    levels = np.asarray(tree.box_levels)
    centers = np.asarray(tree.box_centers)
    root = float(tree.root_extent)

    for what in ("source", "target"):
        coords = np.asarray(getattr(tree, f"{what}s"))
        radii = np.asarray(getattr(tree, f"{what}_radii"))
        starts = np.asarray(getattr(tree, f"box_{what}_starts"))
        nonchild = np.asarray(
            getattr(tree, f"box_{what}_counts_nonchild"))
        cumul = np.asarray(getattr(tree, f"box_{what}_counts_cumul"))
        n = coords.shape[1]
        assert nonchild.sum() == n
        assert cumul[0] == n

        # stick-out containment per box (test_tree.py:451-633)
        for b in range(tree.nboxes):
            sl = slice(starts[b], starts[b] + nonchild[b])
            if sl.start == sl.stop:
                continue
            half = root / (1 << (levels[b] + 1))
            c = centers[:, b:b + 1]
            if extent_norm == "linf":
                assert (coords[:, sl] + radii[sl]
                        <= c + (1 + sof) * half + 1e-12).all(), b
                assert (coords[:, sl] - radii[sl]
                        >= c - (1 + sof) * half - 1e-12).all(), b
            else:
                d = np.sqrt(((coords[:, sl] - c) ** 2).sum(axis=0)) \
                    + radii[sl]
                assert (d * d <= dims * ((1 + sof) * half) ** 2
                        * (1 + 1e-12)).all(), b

        # box particle bounding boxes contain the whole subtree
        bmin = np.asarray(getattr(tree, f"box_{what}_bounding_box_min"))
        bmax = np.asarray(getattr(tree, f"box_{what}_bounding_box_max"))
        children = np.asarray(tree.box_child_ids)
        for b in range(0, tree.nboxes, 7):
            sl = slice(starts[b], starts[b] + cumul[b])
            if sl.start == sl.stop:
                continue
            assert (coords[:, sl] - radii[sl]
                    >= bmin[:, b:b + 1] - 1e-12).all(), b
            assert (coords[:, sl] + radii[sl]
                    <= bmax[:, b:b + 1] + 1e-12).all(), b

    # internal boxes may now hold nonchild particles; check ranges nest
    starts = np.asarray(tree.box_source_starts)
    cumul = np.asarray(tree.box_source_counts_cumul)
    children = np.asarray(tree.box_child_ids)
    for b in range(tree.nboxes):
        for c in children[:, b]:
            if c:
                assert starts[b] <= starts[c]
                assert starts[c] + cumul[c] <= starts[b] + cumul[b]


def test_extent_tree_traversal_rejected():
    sources = make_normal_particle_array(500, 2, np.float64)
    targets = make_uniform_particle_array(500, 2, np.float64)
    radii = np.full(500, 0.01)
    tree = build_tree(sources, targets=targets, source_radii=radii,
                      max_particles_in_box=20)
    from boxtree_tpu.traversal import build_traversal
    with pytest.raises(ValueError):
        build_traversal(tree)
