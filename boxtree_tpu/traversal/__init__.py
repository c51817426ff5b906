from boxtree_tpu import config  # noqa: F401
from boxtree_tpu.traversal.build import (
    FMMTraversalBuilder,
    build_traversal,
    merge_close_lists,
)
from boxtree_tpu.traversal.containers import BuiltList, FMMTraversalInfo

__all__ = [
    "BuiltList",
    "FMMTraversalBuilder",
    "FMMTraversalInfo",
    "build_traversal",
    "merge_close_lists",
]
