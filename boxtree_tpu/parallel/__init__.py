from boxtree_tpu import config  # noqa: F401
from boxtree_tpu.parallel.distributed import DistributedFMMRunner
from boxtree_tpu.parallel.partition import (
    BoxMasks,
    dfs_box_order,
    get_box_masks,
    partition_work,
)

__all__ = [
    "BoxMasks",
    "DistributedFMMRunner",
    "dfs_box_order",
    "get_box_masks",
    "partition_work",
]
