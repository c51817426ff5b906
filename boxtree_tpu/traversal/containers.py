"""Traversal (interaction-list) data structures.

Mirrors ``FMMTraversalInfo`` (``boxtree/traversal.py:1351-1705``) field for
field: the four basic box lists with per-level starts, same-level
non-well-separated boxes ("colleagues" generalized by
``well_sep_is_n_away``), and Lists 1-4 in CSR form, with List 3 stored per
source level with empty rows compressed.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from boxtree_tpu.tree.containers import tree_dataclass


@tree_dataclass(meta=("count", "num_nonempty_lists"))
class BuiltList:
    """One CSR list (mirrors pyopencl's ``BuiltList`` as used at
    ``boxtree/traversal.py:64-67``)."""

    count: int
    starts: Any
    lists: Any
    num_nonempty_lists: int
    nonempty_indices: Any


@tree_dataclass(meta=("well_sep_is_n_away",))
class FMMTraversalInfo:
    """Interaction lists for an FMM evaluation.  See
    ``boxtree/traversal.py:1351-1705`` for the meaning of every attribute;
    names and indexing conventions are identical.
    """

    tree: Any
    well_sep_is_n_away: int

    # basic box lists for iteration
    source_boxes: Any
    target_boxes: Any
    level_start_source_box_nrs: Any
    level_start_target_box_nrs: Any
    source_parent_boxes: Any
    level_start_source_parent_box_nrs: Any
    target_or_target_parent_boxes: Any
    level_start_target_or_target_parent_box_nrs: Any

    # same-level non-well-separated boxes (starts indexed by box id)
    same_level_non_well_sep_boxes_starts: Any
    same_level_non_well_sep_boxes_lists: Any

    # neighbor sources ("List 1"), indexed like target_boxes
    neighbor_source_boxes_starts: Any
    neighbor_source_boxes_lists: Any

    # separated siblings ("List 2"), indexed like target_or_target_parent_boxes
    from_sep_siblings_starts: Any
    from_sep_siblings_lists: Any

    # separated smaller boxes ("List 3"), per source level
    from_sep_smaller_by_level: Any
    target_boxes_sep_smaller_by_source_level: Any
    from_sep_close_smaller_starts: Any
    from_sep_close_smaller_lists: Any

    # separated bigger boxes ("List 4"), indexed like
    # target_or_target_parent_boxes
    from_sep_bigger_starts: Any
    from_sep_bigger_lists: Any
    from_sep_close_bigger_starts: Any
    from_sep_close_bigger_lists: Any

    @property
    def nboxes(self):
        return self.tree.nboxes

    @property
    def nlevels(self):
        return self.tree.nlevels

    @property
    def ntarget_boxes(self):
        return len(self.target_boxes)

    @property
    def ntarget_or_target_parent_boxes(self):
        return len(self.target_or_target_parent_boxes)

    def merge_close_lists(self, debug=False):
        """Merge the "close" lists into List 1
        (mirrors ``boxtree/traversal.py:1650-1693``)."""
        if self.from_sep_close_smaller_starts is None:
            return self

        from boxtree_tpu.traversal.build import merge_close_lists
        return merge_close_lists(self)

    def get_box_list(self, what, index):
        starts = np.asarray(getattr(self, f"{what}_starts"))
        lists = np.asarray(getattr(self, f"{what}_lists"))
        return lists[starts[index]:starts[index + 1]]
