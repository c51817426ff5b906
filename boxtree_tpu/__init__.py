"""boxtree_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the capabilities of
``inducer/boxtree``: adaptive quad/octrees from particles, FMM interaction
lists (Lists 1-4, colleagues), geometric lookup structures, an FMM driver
over an expansion-wrangler interface, FMM cost models, and a distributed FMM
over a :class:`jax.sharding.Mesh`.

Design notes (vs. the reference at ``/root/reference``):

- The tree build is *sort-based*: one full-depth Morton sort of the
  particles, after which every level's box structure is derived with
  vectorized per-level scans (the reference instead runs a host-driven
  level loop with per-level particle renumbering,
  ``boxtree/tree_build.py:698-1283``).
- Traversal interaction lists are built with integer cell arithmetic and
  per-level binary-search existence lookups instead of per-box stack walks
  (``boxtree/traversal.py:98-215``) — branch-free and fully vectorizable on
  TPU vector units.
- The FMM evaluation path (wranglers) is pure ``jax.numpy``/Pallas and is
  end-to-end jittable; M2L is batched by translation class into dense
  matmuls that run on the MXU.
"""

from boxtree_tpu import config  # noqa: F401  (enables 64-bit mode; dtype policy)
from boxtree_tpu.tree.containers import Tree, TreeOfBoxes, box_flags_enum
from boxtree_tpu.tree.build import TreeBuilder, build_tree, MaxLevelsExceeded
from boxtree_tpu.tree.tree_of_boxes import (
    coarsen_tree_of_boxes,
    make_tree_of_boxes_root,
    refine_and_coarsen_tree_of_boxes,
    refine_tree_of_boxes,
    uniformly_refine_tree_of_boxes,
)

__all__ = [
    "Tree",
    "TreeOfBoxes",
    "box_flags_enum",
    "TreeBuilder",
    "build_tree",
    "MaxLevelsExceeded",
    "coarsen_tree_of_boxes",
    "make_tree_of_boxes_root",
    "refine_and_coarsen_tree_of_boxes",
    "refine_tree_of_boxes",
    "uniformly_refine_tree_of_boxes",
]
