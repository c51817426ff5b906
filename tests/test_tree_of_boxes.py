"""Tree-of-boxes tests (mirror ``test/test_tree_of_boxes.py``: uniform
refinement counts/volume conservation, refine/coarsen consistency,
traversal built from a pure TreeOfBoxes)."""

import numpy as np
import pytest

from boxtree_tpu import box_flags_enum
from boxtree_tpu.tree.tree_of_boxes import (
    coarsen_tree_of_boxes,
    make_tree_of_boxes_root,
    refine_tree_of_boxes,
    uniformly_refine_tree_of_boxes,
)
from boxtree_tpu.traversal import build_traversal


def nleaves(tob):
    return int(((np.asarray(tob.box_flags)
                 & box_flags_enum.IS_LEAF_BOX) != 0).sum())


@pytest.mark.parametrize("dims", [1, 2, 3])
def test_uniform_refinement(dims):
    # box counts and volume conservation (test_tree_of_boxes.py:125-149)
    tob = make_tree_of_boxes_root((np.zeros(dims), np.ones(dims)))
    assert tob.nboxes == 1 and nleaves(tob) == 1
    total = 1
    for lev in range(1, 4):
        tob = uniformly_refine_tree_of_boxes(tob)
        assert nleaves(tob) == (2 ** dims) ** lev
        total += (2 ** dims) ** lev
        assert tob.nboxes == total
        # leaf volumes sum to the root volume
        levels = np.asarray(tob.box_levels)
        flags = np.asarray(tob.box_flags)
        lv = levels[(flags & box_flags_enum.IS_LEAF_BOX) != 0]
        vol = np.sum((float(tob.root_extent) / (1 << lv)) ** dims)
        assert np.isclose(vol, float(tob.root_extent) ** dims)


def test_refine_coarsen_roundtrip():
    tob = make_tree_of_boxes_root((np.zeros(2), np.ones(2)))
    tob = uniformly_refine_tree_of_boxes(tob)
    tob2 = uniformly_refine_tree_of_boxes(tob)
    # coarsen all level-1 boxes back
    flags = np.asarray(tob2.box_flags)
    levels = np.asarray(tob2.box_levels)
    coarsen = (levels == 1) & ((flags & box_flags_enum.IS_LEAF_BOX) == 0)
    tob3 = coarsen_tree_of_boxes(tob2, coarsen)
    assert tob3.nboxes == tob.nboxes
    assert nleaves(tob3) == nleaves(tob)
    assert np.allclose(np.asarray(tob3.box_centers),
                       np.asarray(tob.box_centers))


def test_partial_refine():
    tob = make_tree_of_boxes_root((np.zeros(2), np.ones(2)))
    tob = uniformly_refine_tree_of_boxes(tob)
    # refine only box 1 (first child)
    flags = np.zeros(tob.nboxes, bool)
    flags[1] = True
    tob2 = refine_tree_of_boxes(tob, flags)
    assert tob2.nboxes == tob.nboxes + 4
    assert nleaves(tob2) == nleaves(tob) + 3
    # parent/child consistency
    parents = np.asarray(tob2.box_parent_ids)
    children = np.asarray(tob2.box_child_ids)
    for b in range(tob2.nboxes):
        for c in children[:, b]:
            if c:
                assert parents[c] == b


def test_traversal_from_tree_of_boxes():
    # mirror test_tree_of_boxes.py:240-270
    tob = make_tree_of_boxes_root((np.zeros(2), np.ones(2)))
    for _ in range(3):
        tob = uniformly_refine_tree_of_boxes(tob)
    trav = build_traversal(tob)
    # uniform 3-level 2D tree: every leaf is a source & target box
    assert trav.ntarget_boxes == 64
    # list 2 of a leaf: children of parent's colleagues beyond 1 away =
    # classic 27 in 2D for interior boxes
    starts = np.asarray(trav.from_sep_siblings_starts)
    counts = np.diff(starts)
    assert counts.max() == 27


def test_make_meshmode_mesh_from_leaves_contract(monkeypatch):
    """Contract test against a minimal fake mesh module (meshmode is
    absent here): the exported vertices must be exactly each leaf box's
    corners, elements index their own 2^d vertices, and the returned
    map is the leaf-box list (ref boxtree/tree_of_boxes.py:467-504)."""
    import sys
    import types

    calls = {}

    fake_mesh = types.ModuleType("meshmode.mesh")
    fake_mesh.TensorProductElementGroup = type(
        "TensorProductElementGroup", (), {})

    def make_mesh(vertices, groups):
        calls["make_mesh"] = (vertices, groups)
        return ("mesh", vertices, tuple(groups))

    fake_mesh.make_mesh = make_mesh

    fake_gen = types.ModuleType("meshmode.mesh.generation")

    def make_group_from_vertices(vertices, vertex_indices, order, *,
                                 group_cls, unit_nodes):
        calls["group"] = (vertices, vertex_indices, order, group_cls)
        return ("group", vertex_indices)

    fake_gen.make_group_from_vertices = make_group_from_vertices

    fake_root = types.ModuleType("meshmode")
    fake_root.mesh = fake_mesh
    fake_mesh.generation = fake_gen
    monkeypatch.setitem(sys.modules, "meshmode", fake_root)
    monkeypatch.setitem(sys.modules, "meshmode.mesh", fake_mesh)
    monkeypatch.setitem(sys.modules, "meshmode.mesh.generation", fake_gen)

    from boxtree_tpu.tree.tree_of_boxes import (
        make_meshmode_mesh_from_leaves,
    )

    tob = make_tree_of_boxes_root((np.zeros(2), np.ones(2)))
    tob = uniformly_refine_tree_of_boxes(tob)
    flags = np.zeros(tob.nboxes, bool)
    flags[np.asarray(tob.leaf_boxes)[0]] = True
    tob = refine_tree_of_boxes(tob, flags)   # non-uniform leaves

    mesh, leaf_map = make_meshmode_mesh_from_leaves(tob)
    leaves = np.asarray(tob.leaf_boxes)
    np.testing.assert_array_equal(np.asarray(leaf_map), leaves)

    vertices, vertex_indices, order, group_cls = calls["group"]
    assert order == 1
    assert group_cls is fake_mesh.TensorProductElementGroup
    assert vertex_indices.shape == (len(leaves), 4)
    assert mesh[0] == "mesh"

    centers = np.asarray(tob.box_centers)[:, leaves]
    radii = (float(np.asarray(tob.root_extent)) / 2
             / 2.0 ** np.asarray(tob.box_levels)[leaves])
    for e in range(len(leaves)):
        # corner set per element: each axis takes center +- radius,
        # every combination once (tensor-product order, axis 0 fastest)
        got = vertices[:, vertex_indices[e]]
        want = centers[:, e][:, None] + radii[e] * np.array(
            [[-1, 1, -1, 1], [-1, -1, 1, 1]], float)
        np.testing.assert_allclose(got, want)
