"""Deterministic particle generators for tests and benchmarks.

Mirrors the generators in ``boxtree/tools.py:114-283`` (normal, uniform and
surface distributions) using seeded numpy RNGs.
"""

from __future__ import annotations

import numpy as np


def make_normal_particle_array(nparticles, dimensions, dtype, seed=15):
    """(dimensions, nparticles) standard-normal particle coordinates."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dimensions, nparticles)).astype(dtype)


def make_uniform_particle_array(nparticles, dimensions, dtype, seed=15):
    """(dimensions, nparticles) uniform particle coordinates in [-1, 1)."""
    rng = np.random.default_rng(seed)
    return (2 * rng.random((dimensions, nparticles)) - 1).astype(dtype)


def make_surface_particle_array(nparticles, dimensions, dtype, seed=15):
    """Points on the surface of a unit circle/sphere (a highly nonuniform
    distribution for an octree over the bounding cube), following the
    deterministic-surface idea of ``boxtree/tools.py:160-247``."""
    rng = np.random.default_rng(seed)
    if dimensions == 1:
        return np.sign(
            rng.standard_normal((1, nparticles))).astype(dtype)

    x = rng.standard_normal((dimensions, nparticles))
    norm = np.sqrt(np.sum(x * x, axis=0))
    norm = np.where(norm == 0, 1, norm)
    return (x / norm).astype(dtype)
