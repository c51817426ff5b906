"""Tree data structures as JAX pytree dataclasses.

Mirrors the data model of the reference (``boxtree/tree.py:109-688``):
:class:`box_flags_enum`, :class:`TreeOfBoxes` and :class:`Tree`, with the
same field names and conventions (level-major box numbering, ``0`` as the
no-child marker, CSR particle lists per box).

Extensions over the reference (used by the TPU-native traversal and FMM
backends, all derived data):

- ``box_morton_prefixes``: the level-local Morton prefix of every box, which
  makes box lookups a binary search instead of a tree walk.
- ``box_id_of_source`` / ``box_id_of_target``: the owning (nonchild) box of
  every particle, which turns P2M/L2P into one ``segment_sum``/gather.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

from typing import Any, ClassVar

import jax
import numpy as np


def _register(cls, extra_meta=()):
    fields = dataclasses.fields(cls)
    meta = set(extra_meta)
    data_fields = [f.name for f in fields if f.name not in meta]
    meta_fields = [f.name for f in fields if f.name in meta]
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


def tree_dataclass(*, meta=()):
    """Create a frozen dataclass registered as a JAX pytree, with the field
    names in *meta* treated as static (hashable) auxiliary data."""
    def wrap(cls):
        cls = dataclass(frozen=True)(cls)
        return _register(cls, meta)
    return wrap


# {{{ box flags

class box_flags_enum:
    """Constants for the box flags bit field.

    Mirrors ``boxtree/tree.py:109-147``.
    """

    dtype: ClassVar[np.dtype] = np.dtype(np.int32)

    IS_SOURCE_BOX = 1 << 0
    IS_TARGET_BOX = 1 << 1
    IS_SOURCE_OR_TARGET_BOX = IS_SOURCE_BOX | IS_TARGET_BOX
    HAS_SOURCE_CHILD_BOXES = 1 << 2
    HAS_TARGET_CHILD_BOXES = 1 << 3
    HAS_SOURCE_OR_TARGET_CHILD_BOXES = (
        HAS_SOURCE_CHILD_BOXES | HAS_TARGET_CHILD_BOXES)
    IS_LEAF_BOX = 1 << 4

    # Deprecated alias (kept for API parity with the reference).
    HAS_CHILDREN = HAS_SOURCE_OR_TARGET_CHILD_BOXES

# }}}


_TREE_OF_BOXES_META = (
    "box_id_dtype", "box_level_dtype", "coord_dtype",
    "level_start_box_nrs",
    "sources_have_extent", "targets_have_extent",
    "extent_norm", "stick_out_factor", "_is_pruned",
    "max_depth",
)


# {{{ TreeOfBoxes

@tree_dataclass(meta=_TREE_OF_BOXES_META)
class TreeOfBoxes:
    """A quad/octree of boxes (without particle data).

    Mirrors ``boxtree/tree.py:152-291``.  ``level_start_box_nrs`` is kept as
    a host-side tuple of ints so that downstream builders can slice
    per-level box ranges with static shapes.

    .. attribute:: root_extent

        Scalar extent of the root box.

    .. attribute:: box_centers

        ``coord_t [dimensions, nboxes]``

    .. attribute:: box_parent_ids

        ``box_id_t [nboxes]``; the root has itself (0) as parent.

    .. attribute:: box_child_ids

        ``box_id_t [2**dimensions, nboxes]``; 0 is the no-child marker.

    .. attribute:: box_levels

        ``box_level_t [nboxes]``, non-decreasing (boxes are numbered
        level-major, Morton-ordered within each level).

    .. attribute:: box_flags

        Bitwise combination of :class:`box_flags_enum` constants.

    .. attribute:: box_morton_prefixes

        ``int64 [nboxes]`` — extension: level-local Morton prefix of each
        box (``d * level`` significant bits).

    .. attribute:: level_start_box_nrs

        Tuple of ints of length ``nlevels + 1``.
    """

    root_extent: Any
    box_centers: Any

    box_parent_ids: Any
    box_child_ids: Any
    box_levels: Any

    box_flags: Any
    box_morton_prefixes: Any

    level_start_box_nrs: tuple

    box_id_dtype: np.dtype
    box_level_dtype: np.dtype
    coord_dtype: np.dtype

    sources_have_extent: bool
    targets_have_extent: bool
    extent_norm: Any
    stick_out_factor: float

    _is_pruned: bool
    max_depth: int

    @property
    def dimensions(self) -> int:
        return self.box_centers.shape[0]

    @property
    def nboxes(self) -> int:
        return self.box_centers.shape[1]

    @property
    def aligned_nboxes(self) -> int:
        return self.box_child_ids.shape[-1]

    @property
    def nlevels(self) -> int:
        return len(self.level_start_box_nrs) - 1

    @property
    def leaf_boxes(self):
        boxes = np.arange(self.nboxes, dtype=self.box_id_dtype)
        flags = np.asarray(self.box_flags)
        return boxes[flags & box_flags_enum.IS_LEAF_BOX != 0]

    @property
    def bounding_box(self):
        lows = self.box_centers[:, 0] - 0.5 * self.root_extent
        highs = lows + self.root_extent
        return lows, highs

    def get_box_size(self, ibox):
        lev = int(self.box_levels[ibox])
        return self.root_extent * 0.5**lev

    def get_box_extent(self, ibox):
        box_size = self.get_box_size(ibox)
        extent_low = self.box_centers[:, ibox] - 0.5 * box_size
        extent_high = extent_low + box_size
        return extent_low, extent_high

# }}}


# {{{ Tree

@tree_dataclass(meta=_TREE_OF_BOXES_META + (
    "sources_are_targets", "particle_id_dtype"))
class Tree(TreeOfBoxes):
    """A quad/octree of particles sorted into boxes.

    Mirrors ``boxtree/tree.py:296-688``; see there for the meaning of every
    field.  Instances are returned by :func:`boxtree_tpu.build_tree`.

    .. rubric:: Particle ordering

    ``sources``/``targets`` are stored in *tree order*: sorted by full-depth
    Morton key (so any box's particles — including every descendant's — are
    a contiguous range).  ``user_source_ids`` gathers *from* user order into
    tree order; ``sorted_target_ids`` gathers from tree order into user
    order; this matches the reference conventions
    (``boxtree/tree.py:426-438``).
    """

    # flags
    sources_are_targets: bool

    # data types
    particle_id_dtype: np.dtype

    # per-particle arrays
    sources: Any
    source_radii: Any
    targets: Any
    target_radii: Any

    # NOTE: unlike the reference, ``bounding_box`` is not a stored field; the
    # base-class property (root box center +- root_extent/2) is exactly the
    # built bounding box.

    # tree / user order indices
    user_source_ids: Any
    sorted_target_ids: Any

    # box properties
    box_source_starts: Any
    box_source_counts_nonchild: Any
    box_source_counts_cumul: Any
    box_target_starts: Any
    box_target_counts_nonchild: Any
    box_target_counts_cumul: Any

    # particle-adaptive box extents (may be None)
    box_source_bounding_box_min: Any
    box_source_bounding_box_max: Any
    box_target_bounding_box_min: Any
    box_target_bounding_box_max: Any

    # extensions (see module docstring)
    box_id_of_source: Any
    box_id_of_target: Any

    @property
    def dimensions(self) -> int:
        return self.sources.shape[0]

    @property
    def nboxes(self) -> int:
        return self.box_levels.shape[0]

    @property
    def nsources(self) -> int:
        return self.sources.shape[1]

    @property
    def ntargets(self) -> int:
        return self.targets.shape[1]

    # {{{ debugging aids (host-side, mirror boxtree/tree.py:639-684)

    def _reverse_index_lookup(self, ary, new_key_size):
        ary = np.asarray(ary)
        result = np.full(new_key_size, -1, dtype=ary.dtype)
        result[ary] = np.arange(len(ary), dtype=ary.dtype)
        return result

    def indices_to_tree_source_order(self, user_indices):
        tree_source_ids = self._reverse_index_lookup(
            self.user_source_ids, self.nsources)
        return tree_source_ids[np.asarray(user_indices)]

    def indices_to_tree_target_order(self, user_indices):
        return np.asarray(self.sorted_target_ids)[np.asarray(user_indices)]

    def find_box_nr_for_target(self, itarget):
        starts = np.asarray(self.box_target_starts)
        counts = np.asarray(self.box_target_counts_nonchild)
        crit = (starts <= itarget) & (itarget < starts + counts)
        return int(np.nonzero(crit)[0][0])

    def find_box_nr_for_source(self, isource):
        starts = np.asarray(self.box_source_starts)
        counts = np.asarray(self.box_source_counts_nonchild)
        crit = (starts <= isource) & (isource < starts + counts)
        return int(np.nonzero(crit)[0][0])

    def plot(self, **kwargs):
        from boxtree_tpu.utils.visualization import TreePlotter
        plotter = TreePlotter(self)
        plotter.draw_tree(**kwargs)
        plotter.set_bounding_box()

    def get_box_extent(self, ibox):
        lev = int(self.box_levels[ibox])
        box_size = self.root_extent / (1 << lev)
        extent_low = self.box_centers[:, ibox] - 0.5 * box_size
        extent_high = extent_low + box_size
        return extent_low, extent_high

    # }}}

# }}}
