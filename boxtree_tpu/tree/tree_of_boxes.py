"""Trees of boxes (no particles): root factory, refinement, coarsening.

Counterpart of ``boxtree/tree_of_boxes.py``: lightweight box-only trees
for mesh adaptivity.  Internally a tree of boxes is represented by its
*leaf cell set* ``(level, morton prefix)``; refinement/coarsening edit
that set and the level-major box arrays are rebuilt from it — the same
representation the particle build derives from sorted Morton keys, so
:func:`boxtree_tpu.traversal.build_traversal` works on these trees
unchanged (cf. traversal-from-TreeOfBoxes,
``test/test_tree_of_boxes.py:240-270``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from boxtree_tpu import config
from boxtree_tpu.ops import morton
from boxtree_tpu.tree.containers import TreeOfBoxes, box_flags_enum


def _rebuild_from_leaves(leaf_levels, leaf_prefixes, bbox_min, root_extent,
                         coord_dtype=np.float64):
    """Construct level-major box arrays from a leaf cell set."""
    dim = len(bbox_min)
    nchild = 2 ** dim

    # collect all boxes: leaves plus all ancestors
    box_set = {}
    for lev, pfx in zip(leaf_levels, leaf_prefixes):
        lev, pfx = int(lev), int(pfx)
        box_set[(lev, pfx)] = True            # leaf
        while lev > 0:
            lev, pfx = lev - 1, pfx >> dim
            if (lev, pfx) in box_set:
                break
            box_set[(lev, pfx)] = False       # internal

    keys = sorted(box_set)                    # (level, prefix) lex order
    nboxes = len(keys)
    index = {k: i for i, k in enumerate(keys)}
    levels = np.array([k[0] for k in keys], np.int32)
    prefixes = np.array([k[1] for k in keys], np.int64)

    parents = np.zeros(nboxes, np.int32)
    children = np.zeros((nchild, nboxes), np.int32)
    flags = np.zeros(nboxes, np.int32)
    for i, (lev, pfx) in enumerate(keys):
        if lev > 0:
            p = index[(lev - 1, pfx >> dim)]
            parents[i] = p
            children[pfx & (nchild - 1), p] = i
        if box_set[(lev, pfx)]:
            flags[i] |= box_flags_enum.IS_LEAF_BOX \
                | box_flags_enum.IS_SOURCE_BOX \
                | box_flags_enum.IS_TARGET_BOX
        else:
            flags[i] |= box_flags_enum.HAS_SOURCE_OR_TARGET_CHILD_BOXES

    nlevels = int(levels.max()) + 1
    level_starts = tuple(
        int(x) for x in np.searchsorted(levels, np.arange(nlevels + 1)))

    cells = np.asarray(morton.deinterleave(jnp.asarray(prefixes), dim))
    # shift each prefix to its own level's cell coordinates: prefixes are
    # already level-local, so deinterleave directly gives cells
    centers = (np.asarray(bbox_min)[:, None]
               + (cells + 0.5) * (root_extent
                                  / (1 << levels.astype(np.int64))))

    return TreeOfBoxes(
        root_extent=jnp.asarray(root_extent, coord_dtype),
        box_centers=jnp.asarray(centers.astype(coord_dtype)),
        box_parent_ids=jnp.asarray(parents),
        box_child_ids=jnp.asarray(children),
        box_levels=jnp.asarray(levels),
        box_flags=jnp.asarray(flags),
        box_morton_prefixes=jnp.asarray(prefixes),
        level_start_box_nrs=level_starts,
        box_id_dtype=config.box_id_dtype,
        box_level_dtype=config.box_level_dtype,
        coord_dtype=np.dtype(coord_dtype),
        sources_have_extent=False,
        targets_have_extent=False,
        extent_norm=None,
        stick_out_factor=0.0,
        _is_pruned=True,
        max_depth=config.max_morton_depth(dim),
    )


def make_tree_of_boxes_root(bbox, coord_dtype=np.float64):
    """A single-box tree covering *bbox* (mirrors
    ``boxtree/tree_of_boxes.py:392-460``).

    :arg bbox: ``(lower_corner, upper_corner)`` arrays; must be square.
    """
    lo, hi = np.asarray(bbox[0], np.float64), np.asarray(bbox[1], np.float64)
    ext = hi - lo
    if not np.allclose(ext, ext[0]):
        raise ValueError("bbox must be square")
    return _rebuild_from_leaves([0], [0], lo, float(ext[0]), coord_dtype)


def _leaf_cells(tob):
    flags = np.asarray(tob.box_flags)
    leaves = np.nonzero(flags & box_flags_enum.IS_LEAF_BOX)[0]
    return (np.asarray(tob.box_levels)[leaves],
            np.asarray(tob.box_morton_prefixes)[leaves], leaves)


def refine_tree_of_boxes(tob, refine_flags):
    """Split the flagged leaf boxes (``tree_of_boxes.py:155-217``)."""
    return refine_and_coarsen_tree_of_boxes(tob, refine_flags, None)


def coarsen_tree_of_boxes(tob, coarsen_flags):
    """Merge the children of flagged boxes (children must be leaves;
    ``tree_of_boxes.py:220-282``)."""
    return refine_and_coarsen_tree_of_boxes(tob, None, coarsen_flags)


def refine_and_coarsen_tree_of_boxes(tob, refine_flags=None,
                                     coarsen_flags=None):
    """Apply refinement and coarsening flags (one per box) and return a
    new :class:`TreeOfBoxes` (``boxtree/tree_of_boxes.py:351-385``)."""
    dim = tob.dimensions
    nchild = 2 ** dim
    levels = np.asarray(tob.box_levels)
    prefixes = np.asarray(tob.box_morton_prefixes)
    flags = np.asarray(tob.box_flags)
    children = np.asarray(tob.box_child_ids)
    is_leaf = (flags & box_flags_enum.IS_LEAF_BOX) != 0

    refine_flags = (np.zeros(tob.nboxes, bool) if refine_flags is None
                    else np.asarray(refine_flags, bool))
    coarsen_flags = (np.zeros(tob.nboxes, bool) if coarsen_flags is None
                     else np.asarray(coarsen_flags, bool))
    if (refine_flags & coarsen_flags).any():
        raise ValueError("a box may not be both refined and coarsened")
    if (refine_flags & ~is_leaf).any():
        raise ValueError("only leaf boxes may be refined")

    leaf_keys = set()
    for b in np.nonzero(is_leaf)[0]:
        leaf_keys.add((int(levels[b]), int(prefixes[b])))

    # refine: leaf -> 2^d children
    for b in np.nonzero(refine_flags)[0]:
        key = (int(levels[b]), int(prefixes[b]))
        leaf_keys.discard(key)
        for digit in range(nchild):
            leaf_keys.add((key[0] + 1, (key[1] << dim) | digit))

    # coarsen: children (all leaves) -> parent becomes a leaf
    for b in np.nonzero(coarsen_flags)[0]:
        ch = children[:, b]
        ch = ch[ch > 0]
        if len(ch) == 0:
            continue
        if not is_leaf[ch].all():
            raise ValueError(
                f"cannot coarsen box {b}: non-leaf children")
        for c in ch:
            leaf_keys.discard((int(levels[c]), int(prefixes[c])))
        # also remove the pruned (non-materialized) sibling cells
        leaf_keys = {
            k for k in leaf_keys
            if not (k[0] == levels[b] + 1
                    and (k[1] >> dim) == prefixes[b])}
        leaf_keys.add((int(levels[b]), int(prefixes[b])))

    lo, _ = tob.bounding_box
    leaf_levels = [k[0] for k in sorted(leaf_keys)]
    leaf_prefixes = [k[1] for k in sorted(leaf_keys)]
    return _rebuild_from_leaves(
        leaf_levels, leaf_prefixes, np.asarray(lo),
        float(np.asarray(tob.root_extent)), tob.coord_dtype)


def uniformly_refine_tree_of_boxes(tob):
    """Split every leaf."""
    flags = np.asarray(tob.box_flags)
    return refine_tree_of_boxes(
        tob, (flags & box_flags_enum.IS_LEAF_BOX) != 0)


def make_meshmode_mesh_from_leaves(tob):
    """Make a :class:`meshmode.mesh.Mesh` whose (tensor-product)
    elements are the leaf boxes of *tob*, plus the element-number ->
    box-number map.  Mirrors ``boxtree/tree_of_boxes.py:467-504``.

    Requires meshmode (import-guarded: raises :class:`ImportError` with
    a clear message when it is absent, as in this environment; the
    contract is tested against a minimal fake mesh module in
    ``tests/test_tree_of_boxes.py``).

    :returns: ``(mesh, leaf_boxes)``.
    """
    try:
        from meshmode.mesh import TensorProductElementGroup, make_mesh
        from meshmode.mesh.generation import make_group_from_vertices
    except ImportError as exc:                      # pragma: no cover
        raise ImportError(
            "make_meshmode_mesh_from_leaves requires meshmode, which "
            "is not installed") from exc

    dim = tob.dimensions
    lfboxes = np.asarray(tob.leaf_boxes)
    lfcenters = np.asarray(tob.box_centers)[:, lfboxes]
    lflevels = np.asarray(tob.box_levels)[lfboxes]
    lfradii = (float(np.asarray(tob.root_extent)) / 2
               / 2.0 ** lflevels.astype(np.float64))

    # 2^d unit-cell corner nodes in tensor-product order (axis 0
    # fastest), the ordering TensorProductElementGroup expects for
    # bilinear corner vertices
    corners = np.array(
        [[2.0 * ((k >> a) & 1) - 1.0 for k in range(2 ** dim)]
         for a in range(dim)], dtype=lfcenters.dtype)

    nleaf = len(lfboxes)
    lfvertices = (np.repeat(lfcenters, 2 ** dim, axis=1)
                  + np.repeat(lfradii, 2 ** dim)
                  * np.tile(corners, (1, nleaf)))

    # FIXME (like the reference): vertices shared by adjacent leaves
    # are not deduplicated
    vertex_indices = np.arange(
        nleaf * 2 ** dim, dtype=tob.box_id_dtype).reshape(-1, 2 ** dim)
    group = make_group_from_vertices(
        lfvertices, vertex_indices, 1,
        group_cls=TensorProductElementGroup, unit_nodes=None)
    return make_mesh(lfvertices, [group]), tob.leaf_boxes
