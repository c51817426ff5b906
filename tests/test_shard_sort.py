"""Distributed sample sort vs single-device sort (the first building
block of the sharded tree build; see doc/PERF.md design note)."""

import jax
import numpy as np
import pytest

from boxtree_tpu.parallel.shard_sort import (
    sharded_key_sort,
    sharded_rebalance,
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


def test_sharded_sort_with_payload(mesh):
    # key-value sort: the payload must follow its key, and ties must
    # keep input order (stability), matching the single-device
    # lax.sort((keys, vals), num_keys=1)
    rng = np.random.default_rng(33)
    n = 1 << 13
    keys = rng.integers(0, 64, n, dtype=np.int64)    # heavy duplicates
    vals = np.arange(n, dtype=np.int64)
    merged, mvals, counts, ok = sharded_key_sort(
        jax.numpy.asarray(keys), mesh, vals=jax.numpy.asarray(vals),
        capacity_factor=4.0)
    assert ok
    merged, mvals, counts = (np.asarray(merged), np.asarray(mvals),
                             np.asarray(counts))
    got_k = np.concatenate(
        [merged[d, :counts[d]] for d in range(merged.shape[0])])
    got_v = np.concatenate(
        [mvals[d, :counts[d]] for d in range(merged.shape[0])])
    np.testing.assert_array_equal(got_k, np.sort(keys))
    np.testing.assert_array_equal(got_v, np.argsort(keys, kind="stable"))


def test_sharded_rebalance(mesh):
    # sort (ragged shards) then rebalance to equal shards: the result
    # is the globally sorted sequence split evenly, payload attached
    rng = np.random.default_rng(34)
    n = 1 << 13
    keys = ((rng.integers(0, 1 << 40, n, dtype=np.int64) << 20)
            | np.arange(n, dtype=np.int64))
    vals = np.arange(n, dtype=np.int64)
    merged, mvals, counts, ok = sharded_key_sort(
        jax.numpy.asarray(keys), mesh, vals=jax.numpy.asarray(vals))
    assert ok
    shards, vshards, ok2 = sharded_rebalance(
        merged, counts, mesh, vals=mvals)
    assert ok2
    np.testing.assert_array_equal(
        np.asarray(shards).reshape(-1), np.sort(keys))
    np.testing.assert_array_equal(
        np.asarray(vshards).reshape(-1), np.argsort(keys, kind="stable"))


def test_sharded_rebalance_radius_flag(mesh):
    # all keys land on one device after the sort (constant keys) -> the
    # rebalance must report radius overflow for a small radius
    n = 1 << 12
    keys = np.full(n, 7, np.int64)
    merged, counts, ok = sharded_key_sort(
        jax.numpy.asarray(keys), mesh, capacity_factor=8.0)
    assert ok
    _, ok2 = sharded_rebalance(merged, counts, mesh, radius=1)
    assert not ok2
    shards, ok3 = sharded_rebalance(merged, counts, mesh, radius=7)
    assert ok3
    np.testing.assert_array_equal(
        np.asarray(shards).reshape(-1), keys)


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


def test_sharded_permute_matches_fancy_indexing(mesh):
    # data[order] and the inverse permutation, both mesh-sharded; the
    # oracle is plain numpy fancy indexing
    from boxtree_tpu.parallel.shard_sort import sharded_permute
    rng = np.random.default_rng(35)
    n = 1 << 13
    order = rng.permutation(n).astype(np.int64)
    data = rng.standard_normal((n, 3)).astype(np.float32)
    out, inv, ok = sharded_permute(
        jax.numpy.asarray(order), jax.numpy.asarray(data), mesh)
    assert ok
    np.testing.assert_array_equal(
        np.asarray(out).reshape(n, 3), data[order])
    invh = np.empty(n, np.int64)
    invh[order] = np.arange(n)
    np.testing.assert_array_equal(np.asarray(inv).reshape(-1), invh)


def test_sharded_permute_overflow_flag(mesh):
    # a permutation that maps one owner's originals to one requester
    # (identity blocks reversed) still fits; an adversarial one where
    # one rank requests EVERYTHING from rank 0 must trip the flag at a
    # small capacity and pass at nranks
    from boxtree_tpu.parallel.shard_sort import sharded_permute
    n = 1 << 12
    per = n // 8
    order = np.arange(n, dtype=np.int64)
    # rank 0's sorted slots pull one original from every rank,
    # rank-local position 0..: fine at any capacity >= per/nranks + 1.
    # Make rank 0 request ONLY rank 7's originals instead:
    order[:per] = np.arange(7 * per, 8 * per)
    order[7 * per:] = np.arange(per)
    data = np.arange(n, dtype=np.float64)[:, None]
    _, _, ok = sharded_permute(
        jax.numpy.asarray(order), jax.numpy.asarray(data), mesh,
        capacity_factor=2.0)
    assert not ok
    out, inv, ok2 = sharded_permute(
        jax.numpy.asarray(order), jax.numpy.asarray(data), mesh,
        capacity_factor=8.0)
    assert ok2
    np.testing.assert_array_equal(
        np.asarray(out).reshape(-1), data[order].reshape(-1))
