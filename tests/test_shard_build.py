"""Sharded phase A (leaf-level assignment over a device mesh) vs the
single-device ``_phase_a`` oracle — the second building block of the
sharded tree build (doc/PERF.md design note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxtree_tpu import config  # noqa: F401  (x64 + platform pinning)
from boxtree_tpu.parallel.shard_build import sharded_leaf_levels
from boxtree_tpu.tree.build import _phase_a


@pytest.fixture(scope="module")
def mesh():
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return Mesh(np.array(devs[:8]), ("ranks",))


def _single_device_oracle(pts, weights, max_weight, dims):
    depth = config.max_morton_depth(dims)
    codes_s, order, leaf_level, counts_and_unfit, _, _ = _phase_a(
        jnp.asarray(pts), jnp.asarray(weights),
        jnp.zeros(pts.shape[1]), jnp.zeros(dims), 1.0,
        max_weight, 0.0, dimensions=dims, depth=depth,
        adaptive=True, use_bbox=False, has_extents=False,
        extent_norm="linf")
    return (np.asarray(codes_s), np.asarray(order),
            np.asarray(leaf_level), np.asarray(counts_and_unfit), depth)


@pytest.mark.parametrize("dims,n", [(2, 1 << 12), (3, 1 << 13)])
def test_sharded_phase_a_matches_single_device(mesh, dims, n):
    rng = np.random.default_rng(41)
    pts = rng.random((dims, n))
    weights = np.ones(n, np.int64)
    codes_s, order, leaf_ref, counts_ref, depth = _single_device_oracle(
        pts, weights, 30, dims)

    leaf, counts = sharded_leaf_levels(
        jnp.asarray(codes_s), jnp.asarray(weights[order]), mesh,
        max_weight=30, dimensions=dims, depth=depth)
    np.testing.assert_array_equal(np.asarray(leaf), leaf_ref)
    np.testing.assert_array_equal(counts, counts_ref)


def test_sharded_phase_a_nonuniform_weights(mesh):
    # clustered points + varying refine weights: boxes span shard
    # boundaries at many levels
    rng = np.random.default_rng(42)
    dims, n = 2, 1 << 12
    pts = np.concatenate([
        rng.random((dims, n // 2)) * 0.02,          # dense cluster
        rng.random((dims, n // 2)),
    ], axis=1)
    weights = rng.integers(1, 4, n).astype(np.int64)
    codes_s, order, leaf_ref, counts_ref, depth = _single_device_oracle(
        pts, weights, 17, dims)

    leaf, counts = sharded_leaf_levels(
        jnp.asarray(codes_s), jnp.asarray(weights[order]), mesh,
        max_weight=17, dimensions=dims, depth=depth)
    np.testing.assert_array_equal(np.asarray(leaf), leaf_ref)
    np.testing.assert_array_equal(counts, counts_ref)
