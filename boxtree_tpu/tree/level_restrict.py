"""2:1 level restriction for adaptive trees (placeholder, implemented in a
later milestone — see ``boxtree/tree_build_kernels.py:825-915`` for the
reference's force-split upward sweep)."""

from __future__ import annotations


def restrict_leaf_levels(codes_s, leaf_level, *, dimensions, depth):
    raise NotImplementedError(
        "kind='adaptive-level-restricted' is not implemented yet")
