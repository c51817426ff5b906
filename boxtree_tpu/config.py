"""Global configuration and dtype policy for boxtree_tpu.

boxtree_tpu uses 64-bit Morton keys for its sort-based tree build, so we
enable JAX's 64-bit mode package-wide.  Coordinates may be float32 or
float64 (user choice); integer box/particle ids are int32; Morton keys are
int64.

Reference dtype policy being mirrored: ``boxtree/tree_build.py:259-261``
(int32 particle/box ids) with uint8 levels (we use int32 levels, which is
faster on TPU vector units and removes narrow-int layout constraints).
"""

from __future__ import annotations

import os

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

# Honor an explicit JAX_PLATFORMS from the environment.  (Some site
# customizations re-register platform plugins and overwrite the setting;
# restoring it here keeps `JAX_PLATFORMS=cpu python ...` working.)
_env_platforms = os.environ.get("JAX_PLATFORMS")
if _env_platforms and jax.config.jax_platforms != _env_platforms:
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:  # pragma: no cover
        pass

# Optional persistent compilation cache (opt-in via BOXTREE_TPU_CACHE).
# NOTE: disabled by default — on this machine, reloading AOT-cached CPU
# executables across processes trips a machine-feature mismatch
# (cpu_aot_loader "prefer-no-gather not supported" -> SIGILL).
_cache_dir = os.environ.get("BOXTREE_TPU_CACHE")
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax
        pass

# id dtypes
box_id_dtype = np.dtype(np.int32)
particle_id_dtype = np.dtype(np.int32)
box_level_dtype = np.dtype(np.int32)
morton_dtype = np.dtype(np.int64)
refine_weight_dtype = np.dtype(np.int32)

#: Stretch factor applied to the root box extent so that scaled particle
#: coordinates are always strictly less than 1.
#: (mirrors ``boxtree/tree_build.py:101`` ROOT_EXTENT_STRETCH_FACTOR)
ROOT_EXTENT_STRETCH_FACTOR = 1e-4


def max_morton_depth(dimensions: int) -> int:
    """Deepest tree level representable in a single signed-int64 Morton key.

    ``dimensions * depth`` bits must fit in 62 bits (sign bit plus one guard
    bit reserved).  This bounds the number of tree levels at 63/31/21 for
    1/2/3 dimensions — enough for all practical particle distributions (the
    reference's float-mantissa bound is ~53 levels for float64 coordinates,
    ``boxtree/tree_build.py:620-623``).
    """
    return 62 // dimensions
