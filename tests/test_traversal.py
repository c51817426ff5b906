"""Structural traversal invariants (ports ``test/test_traversal.py``):
box-list consistency, List-1 membership, List-2 separation distance,
List 3/4 duality, level-start arrays, translation/rotation classes
against recomputed geometry, plot smoke test.
"""

import numpy as np
import pytest

from boxtree_tpu import build_tree, box_flags_enum
from boxtree_tpu.traversal import build_traversal
from boxtree_tpu.traversal.translation_classes import (
    RotationClassesBuilder,
    TranslationClassesBuilder,
)
from boxtree_tpu.utils.particles import make_normal_particle_array


@pytest.fixture(scope="module", params=[2, 3])
def tree_and_trav(request):
    dims = request.param
    pts = make_normal_particle_array(5000, dims, np.float64, seed=21)
    tree = build_tree(pts, max_particles_in_box=20)
    return tree, build_traversal(tree)


def _csr_rows(starts):
    counts = np.diff(np.asarray(starts))
    return np.repeat(np.arange(len(counts)), counts)


def test_box_lists_consistency(tree_and_trav):
    tree, trav = tree_and_trav
    flags = np.asarray(tree.box_flags)
    # source boxes <-> IS_SOURCE_BOX flag (test_traversal.py:85-91)
    sb = np.asarray(trav.source_boxes)
    assert (flags[sb] & box_flags_enum.IS_SOURCE_BOX).all()
    spb = np.asarray(trav.source_parent_boxes)
    assert (flags[spb] & box_flags_enum.HAS_SOURCE_CHILD_BOXES).all()
    # level starts consistent (test_traversal.py:252-266)
    levels = np.asarray(tree.box_levels)
    for lst, ls in [(sb, trav.level_start_source_box_nrs),
                    (spb, trav.level_start_source_parent_box_nrs),
                    (np.asarray(trav.target_boxes),
                     trav.level_start_target_box_nrs),
                    (np.asarray(trav.target_or_target_parent_boxes),
                     trav.level_start_target_or_target_parent_box_nrs)]:
        ls = np.asarray(ls)
        for lev in range(tree.nlevels):
            assert (levels[lst[ls[lev]:ls[lev + 1]]] == lev).all()


def test_list1_members_are_adjacent_source_boxes(tree_and_trav):
    # test_traversal.py:106-117
    tree, trav = tree_and_trav
    flags = np.asarray(tree.box_flags)
    centers = np.asarray(tree.box_centers)
    levels = np.asarray(tree.box_levels)
    root = float(tree.root_extent)

    rows = _csr_rows(trav.neighbor_source_boxes_starts)
    tgt = np.asarray(trav.target_boxes)[rows]
    src = np.asarray(trav.neighbor_source_boxes_lists)
    assert (flags[src] & box_flags_enum.IS_SOURCE_BOX).all()
    rt = root / (1 << (levels[tgt] + 1)).astype(np.float64)
    rs = root / (1 << (levels[src] + 1)).astype(np.float64)
    dist = np.max(np.abs(centers[:, tgt] - centers[:, src]), axis=0)
    assert (dist <= (rt + rs) * (1 + 1e-12)).all()


def test_list2_separation(tree_and_trav):
    # same level + center distance > 2.5 box radii (test_traversal.py:122-136)
    tree, trav = tree_and_trav
    centers = np.asarray(tree.box_centers)
    levels = np.asarray(tree.box_levels)
    root = float(tree.root_extent)

    rows = _csr_rows(trav.from_sep_siblings_starts)
    tgt = np.asarray(trav.target_or_target_parent_boxes)[rows]
    src = np.asarray(trav.from_sep_siblings_lists)
    assert (levels[tgt] == levels[src]).all()
    rad = root / (1 << (levels[tgt] + 1)).astype(np.float64)
    dist = np.linalg.norm(centers[:, tgt] - centers[:, src], axis=0)
    assert (dist > 2.5 * rad).all()


def test_list3_list4_duality(tree_and_trav):
    """Every (coarse target, fine source) pair in List 3 has the dual
    (fine target, coarse source) pair in List 4, when both boxes carry
    targets and sources respectively (test_traversal.py:141-218)."""
    tree, trav = tree_and_trav
    flags = np.asarray(tree.box_flags)

    l4_pairs = set()
    rows = _csr_rows(trav.from_sep_bigger_starts)
    totp = np.asarray(trav.target_or_target_parent_boxes)
    for t, s in zip(totp[rows], np.asarray(trav.from_sep_bigger_lists)):
        l4_pairs.add((int(t), int(s)))

    for lvl, ssn in enumerate(trav.from_sep_smaller_by_level):
        if ssn.count == 0:
            continue
        rows = _csr_rows(ssn.starts)
        tb = np.asarray(
            trav.target_boxes_sep_smaller_by_source_level[lvl])
        for t, s in zip(tb[rows], np.asarray(ssn.lists)):
            t, s = int(t), int(s)
            # dual: s's targets hear from t's sources via list 4
            if (flags[s] & box_flags_enum.IS_TARGET_BOX) \
                    and (flags[t] & box_flags_enum.IS_SOURCE_BOX):
                assert (s, t) in l4_pairs, (t, s)


def test_translation_and_rotation_classes(tree_and_trav):
    # recompute translation vectors geometrically (test_traversal.py:327-403)
    tree, trav = tree_and_trav
    centers = np.asarray(tree.box_centers)
    levels = np.asarray(tree.box_levels)
    root = float(tree.root_extent)

    info = TranslationClassesBuilder()(trav)
    cls = np.asarray(info.from_sep_siblings_translation_classes)
    dist_map = np.asarray(
        info.from_sep_siblings_translation_class_to_distance_vector)

    rows = _csr_rows(trav.from_sep_siblings_starts)
    tgt = np.asarray(trav.target_or_target_parent_boxes)[rows]
    src = np.asarray(trav.from_sep_siblings_lists)
    vec = centers[:, tgt] - centers[:, src]
    assert np.allclose(vec, dist_map[:, cls], rtol=1e-10,
                       atol=1e-12 * root)

    if tree.dimensions == 3:
        rinfo = RotationClassesBuilder()(trav)
        rcls = np.asarray(rinfo.from_sep_siblings_rotation_classes)
        angles = np.asarray(
            rinfo.from_sep_siblings_rotation_class_to_angle)
        vn = vec / np.linalg.norm(vec, axis=0)
        assert np.allclose(np.arccos(vn[2]), angles[rcls], atol=1e-12)


def test_plot_smoke():
    # test_traversal.py:278-319
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from boxtree_tpu.utils.visualization import TreePlotter, draw_box_lists

    pts = make_normal_particle_array(500, 2, np.float64)
    tree = build_tree(pts, max_particles_in_box=30)
    trav = build_traversal(tree)

    plotter = TreePlotter(tree)
    plotter.draw_tree()
    plotter.set_bounding_box()
    draw_box_lists(plotter, trav, tree.nboxes - 1)
    assert len(plotter.get_tikz_for_tree()) > 100
    plt.close("all")
