from boxtree_tpu import config  # noqa: F401
from boxtree_tpu.fmm.drive import (
    ExpansionWranglerInterface,
    TreeIndependentDataForWrangler,
    drive_fmm,
    jit_drive_fmm,
    staged_drive_fmm,
)

__all__ = [
    "ExpansionWranglerInterface",
    "TreeIndependentDataForWrangler",
    "drive_fmm",
    "jit_drive_fmm",
    "staged_drive_fmm",
]
