"""Morton (Z-order) key encoding/decoding on int64, vectorized for JAX.

The tree build sorts particles by a single full-depth Morton key and derives
every level's box structure from key prefixes (an idiomatic-TPU redesign of
the reference's per-level Morton-digit scan,
``boxtree/tree_build_kernels.py:352-445``).

Bit layout convention (matches the reference's digit convention,
``boxtree/tree_build_kernels.py:440-445``): the level-``l`` digit of a key
occupies bits ``[d*(D-l), d*(D-l+1))`` and within each ``d``-bit digit, axis
0 (x) holds the *most* significant bit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# 64-bit bit-spread magic constants.
_SPREAD2_MASKS = [
    (16, np.int64(0x0000FFFF0000FFFF)),
    (8, np.int64(0x00FF00FF00FF00FF)),
    (4, np.int64(0x0F0F0F0F0F0F0F0F)),
    (2, np.int64(0x3333333333333333)),
    (1, np.int64(0x5555555555555555)),
]

_SPREAD3_MASKS = [
    (32, np.int64(0x001F00000000FFFF)),
    (16, np.int64(0x001F0000FF0000FF)),
    (8, np.int64(0x100F00F00F00F00F)),
    (4, np.int64(0x10C30C30C30C30C3)),
    (2, np.int64(0x1249249249249249)),
]


def _spread(x, dimensions: int):
    """Insert ``dimensions-1`` zero bits between the bits of ``x`` (int64)."""
    if dimensions == 1:
        return x
    if dimensions == 2:
        masks = _SPREAD2_MASKS
        x = x & np.int64(0xFFFFFFFF)
    else:
        masks = _SPREAD3_MASKS
        x = x & np.int64(0x1FFFFF)
    for shift, mask in masks:
        x = (x | (x << np.int64(shift))) & mask
    return x


def _compact(x, dimensions: int):
    """Inverse of :func:`_spread`."""
    if dimensions == 1:
        return x
    if dimensions == 2:
        masks = _SPREAD2_MASKS
        final_mask = np.int64(0xFFFFFFFF)
    else:
        masks = _SPREAD3_MASKS
        final_mask = np.int64(0x1FFFFF)
    x = x & masks[-1][1]
    # Undo the spread steps in reverse: shift amount of step i pairs with
    # the mask of step i-1 (and the final step recovers the packed value).
    for i in range(len(masks) - 1, 0, -1):
        x = (x | (x >> np.int64(masks[i][0]))) & masks[i - 1][1]
    x = (x | (x >> np.int64(masks[0][0]))) & final_mask
    return x


def interleave(cells):
    """Encode integer cell coordinates into a Morton key.

    :arg cells: int64 array of shape ``(dimensions, n)`` with per-axis cell
        indices at some fixed depth.
    :returns: int64 array of shape ``(n,)``.
    """
    dimensions = cells.shape[0]
    code = jnp.zeros(cells.shape[1:], dtype=jnp.int64)
    for ax in range(dimensions):
        code = code | (_spread(cells[ax], dimensions)
                       << np.int64(dimensions - 1 - ax))
    return code


def deinterleave(code, dimensions: int):
    """Decode a Morton key back into per-axis cell coordinates.

    :returns: int64 array of shape ``(dimensions,) + code.shape``.
    """
    return jnp.stack([
        _compact((code >> np.int64(dimensions - 1 - ax))
                 & _axis_mask(dimensions), dimensions)
        for ax in range(dimensions)])


def _axis_mask(dimensions: int):
    if dimensions == 1:
        return np.int64(-1)
    if dimensions == 2:
        return _SPREAD2_MASKS[-1][1]
    return _SPREAD3_MASKS[-1][1]


def cells_from_coords(coords, bbox_min, root_extent, depth: int):
    """Integer cell coordinates of particles at tree depth ``depth``.

    Mirrors the reference's scaled-coordinate bit extraction
    (``boxtree/tree_build_kernels.py:374-377``): the bounding box is
    stretched so scaled coordinates are strictly below 1, and cells are
    ``floor(scaled * 2**depth)`` clamped into range.

    :arg coords: ``(dimensions, n)`` float array.
    :arg bbox_min: ``(dimensions,)`` float array.
    :arg root_extent: scalar.
    """
    scaled = (coords - bbox_min[:, None]) / root_extent
    nbuckets = np.int64(1) << np.int64(depth)
    cells = jnp.floor(scaled * nbuckets.astype(scaled.dtype)).astype(jnp.int64)
    return jnp.clip(cells, 0, nbuckets - 1)


def encode_points(coords, bbox_min, root_extent, depth: int):
    """Full-depth Morton keys for particle coordinates."""
    return interleave(cells_from_coords(coords, bbox_min, root_extent, depth))
