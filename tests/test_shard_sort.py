"""Distributed sample sort vs single-device sort (the first building
block of the sharded tree build; see doc/PERF.md design note)."""

import jax
import numpy as np
import pytest

from boxtree_tpu.parallel.shard_sort import (
    sharded_key_sort,
    sharded_sort_gather,
)


@pytest.fixture(scope="module")
def mesh():
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return Mesh(np.array(devs[:8]), ("ranks",))


def test_sharded_sort_matches_single_device(mesh):
    rng = np.random.default_rng(31)
    n = 1 << 14
    # morton-key-like payload: high random bits | index (unique keys)
    keys = ((rng.integers(0, 1 << 40, n, dtype=np.int64) << 20)
            | np.arange(n, dtype=np.int64))
    got = sharded_sort_gather(jax.numpy.asarray(keys), mesh)
    np.testing.assert_array_equal(got, np.sort(keys))


def test_sharded_sort_skewed_distribution(mesh):
    # heavy skew: 90% of keys in one narrow band (stress splitters)
    rng = np.random.default_rng(32)
    n = 1 << 13
    a = rng.integers(1000, 1010, (9 * n) // 10, dtype=np.int64)
    b = rng.integers(0, 1 << 50, n - a.shape[0], dtype=np.int64)
    keys = np.concatenate([a, b])
    rng.shuffle(keys)
    got = sharded_sort_gather(jax.numpy.asarray(keys), mesh,
                              capacity_factor=2.0)
    np.testing.assert_array_equal(got, np.sort(keys))


def test_sharded_sort_overflow_flag(mesh):
    # constant keys overflow any < nranks capacity factor; the flag
    # must report it (and the gather wrapper must recover by retrying)
    n = 1 << 12
    keys = np.full(n, 42, np.int64)
    _, _, ok = sharded_key_sort(jax.numpy.asarray(keys), mesh,
                                capacity_factor=1.5)
    assert not ok
    got = sharded_sort_gather(jax.numpy.asarray(keys), mesh,
                              capacity_factor=1.5)
    np.testing.assert_array_equal(got, keys)
