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


def test_sharded_front_end_pipeline(mesh):
    """Full sharded front end: points -> sharded Morton codes ->
    distributed key-value sample sort -> rebalance -> sharded leaf
    levels, bitwise equal to the single-device ``_phase_a``."""
    from boxtree_tpu.parallel.shard_build import sharded_morton_codes
    from boxtree_tpu.parallel.shard_sort import (
        sharded_key_sort, sharded_rebalance)

    rng = np.random.default_rng(61)
    dims, n = 3, 1 << 13
    pts = np.concatenate([
        rng.random((dims, n // 2)) * 0.03,          # cluster: deep tree
        rng.random((dims, n // 2)),
    ], axis=1)
    weights = np.ones(n, np.int64)
    codes_ref, order_ref, leaf_ref, counts_ref, depth = \
        _single_device_oracle(pts, weights, 30, dims)

    codes, bbox_min, root_extent = sharded_morton_codes(pts, mesh)
    merged, mvals, counts, ok = sharded_key_sort(
        codes, mesh, vals=jnp.arange(n, dtype=jnp.int64),
        capacity_factor=4.0)   # clustered keys: skewed buckets
    assert ok
    shards, vshards, ok2 = sharded_rebalance(
        merged, counts, mesh, vals=mvals)
    assert ok2

    codes_s = np.asarray(shards).reshape(-1)
    order = np.asarray(vshards).reshape(-1)
    np.testing.assert_array_equal(codes_s, codes_ref)
    np.testing.assert_array_equal(order, order_ref)

    leaf, counts_out = sharded_leaf_levels(
        jnp.asarray(codes_s), jnp.asarray(weights[order]), mesh,
        max_weight=30, dimensions=dims, depth=depth)
    np.testing.assert_array_equal(np.asarray(leaf), leaf_ref)
    np.testing.assert_array_equal(counts_out, counts_ref)


def _assert_trees_equal(tree_s, tree):
    assert tree_s.level_start_box_nrs == tree.level_start_box_nrs
    for field in ("box_morton_prefixes", "box_levels", "box_parent_ids",
                  "box_child_ids", "box_flags", "box_source_starts",
                  "box_source_counts_cumul", "box_source_counts_nonchild",
                  "box_target_starts", "box_target_counts_cumul",
                  "user_source_ids", "sorted_target_ids",
                  "box_id_of_source", "box_id_of_target"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tree_s, field)),
            np.asarray(getattr(tree, field)), err_msg=field)
    # centers: XLA fuses (cells + 0.5) * size + bbox_min into an FMA
    # inside _phase_b; the host assembly rounds the mul and add
    # separately -> up to 1 ulp apart
    np.testing.assert_allclose(
        np.asarray(tree_s.box_centers), np.asarray(tree.box_centers),
        rtol=5e-16)
    np.testing.assert_array_equal(
        np.asarray(tree_s.sources), np.asarray(tree.sources))


def test_sharded_build_tree_matches_build_tree(mesh):
    """End-to-end: the sharded pipeline's assembled Tree is
    field-for-field identical to ``build_tree``'s, and drives the
    counting FMM to exact completeness."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import sharded_build_tree

    rng = np.random.default_rng(71)
    dims, n, mpb = 3, 1 << 13, 30
    pts = np.concatenate([
        rng.random((dims, n // 2)) * 0.05,
        rng.random((dims, n // 2)),
    ], axis=1)

    tree_s = sharded_build_tree(pts, mesh, max_particles_in_box=mpb)
    tree = build_tree(pts, max_particles_in_box=mpb)
    _assert_trees_equal(tree_s, tree)

    # the assembled tree drives the counting FMM exactly
    from boxtree_tpu.fmm import drive_fmm
    from boxtree_tpu.models.constant_one import (
        ConstantOneExpansionWrangler,
        ConstantOneTreeIndependentDataForWrangler)
    from boxtree_tpu.traversal import build_traversal
    trav = build_traversal(tree_s)
    pot = drive_fmm(ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav),
        (jnp.ones(n),))
    np.testing.assert_allclose(np.asarray(pot), n, rtol=0, atol=1e-9)


@pytest.mark.parametrize("kind", ["non-adaptive",
                                  "adaptive-level-restricted"])
def test_sharded_build_tree_kinds(mesh, kind):
    """The full ``_TREE_KINDS`` matrix builds sharded, field-for-field
    equal to the single-device build of the same kind (clustered points
    so the kinds actually differ from plain adaptive)."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import sharded_build_tree

    rng = np.random.default_rng(72)
    dims, n, mpb = 3, 1 << 12, 30
    pts = np.concatenate([
        rng.random((dims, n // 4)) * 0.03 + 0.9,
        rng.random((dims, 3 * n // 4)),
    ], axis=1)

    tree_s = sharded_build_tree(pts, mesh, max_particles_in_box=mpb,
                                kind=kind)
    tree = build_tree(pts, max_particles_in_box=mpb, kind=kind)
    _assert_trees_equal(tree_s, tree)


def test_sharded_neighbor_table(mesh):
    """Per-rank neighbor-table rows (sharded, level-synchronous with a
    one-row-per-level halo) == the single-device packed table."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import (
        sharded_box_skeleton, sharded_neighbor_table)
    from boxtree_tpu.traversal.neighbors import build_neighbor_table
    from boxtree_tpu.tree.containers import box_flags_enum

    rng = np.random.default_rng(81)
    for dims, n, mpb in ((2, 1 << 12, 25), (3, 1 << 13, 40)):
        pts = np.concatenate([
            rng.random((dims, n // 2)) * 0.04,
            rng.random((dims, n // 2)),
        ], axis=1)
        weights = np.ones(n, np.int64)
        codes_s, order, leaf_ref, counts_ref, depth = \
            _single_device_oracle(pts, weights, mpb, dims)
        skel = sharded_box_skeleton(
            jnp.asarray(codes_s), jnp.asarray(leaf_ref),
            counts_ref, mesh, dimensions=dims, depth=depth)
        tree = build_tree(pts, max_particles_in_box=mpb)

        rows = np.asarray(sharded_neighbor_table(tree, skel, mesh))

        lsb = tree.level_start_box_nrs
        tgt_mask = (np.asarray(tree.box_flags)
                    & box_flags_enum.IS_TARGET_BOX) != 0
        ref = np.asarray(build_neighbor_table(
            tree.box_morton_prefixes, tree.box_parent_ids,
            tree.box_child_ids, tree.box_flags,
            jnp.asarray(tgt_mask), dimensions=dims, lsb=lsb))

        nb = np.asarray(skel["nboxes"])
        ids = np.concatenate(
            [np.asarray(skel["box_id"])[r, :nb[r]] for r in range(8)])
        got = np.concatenate(
            [rows[r, :nb[r]] for r in range(8)])
        full = np.empty_like(got, shape=(tree.nboxes, got.shape[1]))
        full[ids] = got
        np.testing.assert_array_equal(full, ref)


def test_sharded_box_skeleton_matches_tree(mesh):
    """The per-shard phase B box skeleton (ids, prefixes, levels,
    particle ranges, parents, children) == the single-device tree,
    row-for-row after gathering each shard's owned boxes."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import sharded_box_skeleton

    rng = np.random.default_rng(51)
    for dims, n, mpb in ((2, 1 << 12, 25), (3, 1 << 13, 40)):
        pts = np.concatenate([
            rng.random((dims, n // 2)) * 0.04,      # cluster: deep tree
            rng.random((dims, n // 2)),
        ], axis=1)
        weights = np.ones(n, np.int64)
        codes_s, order, leaf_ref, counts_ref, depth = \
            _single_device_oracle(pts, weights, mpb, dims)

        out = sharded_box_skeleton(
            jnp.asarray(codes_s), jnp.asarray(leaf_ref),
            counts_ref, mesh, dimensions=dims, depth=depth)

        # single-device oracle tree (same particle order: sorted)
        tree = build_tree(pts, max_particles_in_box=mpb)
        nboxes = tree.nboxes

        nb = np.asarray(out["nboxes"])
        assert nb.sum() == nboxes
        ids = np.concatenate(
            [np.asarray(out["box_id"])[r, :nb[r]] for r in range(8)])
        # every box appears exactly once across shards
        np.testing.assert_array_equal(np.sort(ids), np.arange(nboxes))

        def gathered(key):
            vals = np.concatenate(
                [np.asarray(out[key])[r, :nb[r]] for r in range(8)])
            full = np.empty(vals.shape, vals.dtype)
            full[ids] = vals
            return full

        np.testing.assert_array_equal(
            gathered("box_morton"), np.asarray(tree.box_morton_prefixes))
        np.testing.assert_array_equal(
            gathered("box_level"), np.asarray(tree.box_levels))
        np.testing.assert_array_equal(
            gathered("box_parent")[1:],
            np.asarray(tree.box_parent_ids)[1:])
        # particle ranges: sources == sorted particles here, so the
        # tree's box_source_starts/counts_cumul are the oracle
        np.testing.assert_array_equal(
            gathered("box_start"), np.asarray(tree.box_source_starts))
        np.testing.assert_array_equal(
            gathered("box_count_cumul"),
            np.asarray(tree.box_source_counts_cumul))
        # children: (nboxes, 2^d) vs tree's (2^d, nboxes) with 0 = none
        ch = np.concatenate(
            [np.asarray(out["box_child"])[r, :nb[r]] for r in range(8)])
        full_ch = np.empty(ch.shape, ch.dtype)
        full_ch[ids] = ch
        ref_ch = np.asarray(tree.box_child_ids).T.astype(np.int64)
        np.testing.assert_array_equal(
            np.where(full_ch < 0, 0, full_ch), ref_ch)


def test_sharded_l1_edges(mesh):
    """Per-rank List-1 edge emission over the sharded neighbor table:
    the union of every rank's (tgt << 32 | src) keys == the
    single-device traversal's List 1 exactly."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import (
        sharded_box_skeleton, sharded_l1_edges, sharded_neighbor_table)
    from boxtree_tpu.traversal import build_traversal

    rng = np.random.default_rng(83)
    for dims, n, mpb in ((2, 1 << 12, 25), (3, 1 << 13, 40)):
        pts = np.concatenate([
            rng.random((dims, n // 2)) * 0.04,      # deep cluster
            rng.random((dims, n // 2)),
        ], axis=1)
        weights = np.ones(n, np.int64)
        codes_s, order, leaf_ref, counts_ref, depth = \
            _single_device_oracle(pts, weights, mpb, dims)
        skel = sharded_box_skeleton(
            jnp.asarray(codes_s), jnp.asarray(leaf_ref),
            counts_ref, mesh, dimensions=dims, depth=depth)
        tree = build_tree(pts, max_particles_in_box=mpb)
        ntable_rows = sharded_neighbor_table(tree, skel, mesh)

        keys, counts = sharded_l1_edges(tree, skel, ntable_rows, mesh)
        keys = np.asarray(keys)
        counts = np.asarray(counts)
        got = np.sort(np.concatenate(
            [keys[r, :counts[r]] for r in range(8)]))

        trav = build_traversal(tree)
        starts = np.asarray(trav.neighbor_source_boxes_starts)
        lists = np.asarray(trav.neighbor_source_boxes_lists)
        tb = np.asarray(trav.target_boxes).astype(np.int64)
        rows = np.repeat(np.arange(len(tb)), np.diff(starts))
        ref = np.sort((tb[rows] << 32) | lists)
        np.testing.assert_array_equal(got, ref)


def test_sharded_l2_edges(mesh):
    """Per-rank List-2 (sep-siblings) edge emission over the sharded
    neighbor table: the union of every rank's (tgt << 32 | src) keys ==
    the single-device traversal's List 2 exactly, with no cross-device
    exchange in the block at all."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import (
        sharded_box_skeleton, sharded_l2_edges, sharded_neighbor_table)
    from boxtree_tpu.traversal import build_traversal

    rng = np.random.default_rng(89)
    for dims, n, mpb in ((2, 1 << 12, 25), (3, 1 << 13, 40)):
        pts = np.concatenate([
            rng.random((dims, n // 2)) * 0.04,      # deep cluster
            rng.random((dims, n // 2)),
        ], axis=1)
        weights = np.ones(n, np.int64)
        codes_s, order, leaf_ref, counts_ref, depth = \
            _single_device_oracle(pts, weights, mpb, dims)
        skel = sharded_box_skeleton(
            jnp.asarray(codes_s), jnp.asarray(leaf_ref),
            counts_ref, mesh, dimensions=dims, depth=depth)
        tree = build_tree(pts, max_particles_in_box=mpb)
        ntable_rows = sharded_neighbor_table(tree, skel, mesh)

        keys, counts = sharded_l2_edges(tree, skel, ntable_rows, mesh)
        keys = np.asarray(keys)
        counts = np.asarray(counts)
        got = np.sort(np.concatenate(
            [keys[r, :counts[r]] for r in range(8)]))

        trav = build_traversal(tree)
        starts = np.asarray(trav.from_sep_siblings_starts)
        lists = np.asarray(trav.from_sep_siblings_lists)
        totp = np.asarray(
            trav.target_or_target_parent_boxes).astype(np.int64)
        rows = np.repeat(np.arange(len(totp)), np.diff(starts))
        ref = np.sort((totp[rows] << 32) | lists)
        np.testing.assert_array_equal(got, ref)


def test_sharded_l3l4_edges(mesh):
    """Per-rank slnws / List-3 / List-4 edge emission over the sharded
    neighbor table: the union of every rank's keys == the single-device
    traversal's lists exactly, with one per-level last-row all_gather as
    the only cross-device exchange."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import (
        sharded_box_skeleton, sharded_l3l4_edges, sharded_neighbor_table)
    from boxtree_tpu.traversal import build_traversal

    rng = np.random.default_rng(97)
    for dims, n, mpb in ((2, 1 << 12, 25), (3, 1 << 13, 40)):
        pts = np.concatenate([
            rng.random((dims, n // 2)) * 0.04,      # deep cluster
            rng.random((dims, n // 2)),
        ], axis=1)
        weights = np.ones(n, np.int64)
        codes_s, order, leaf_ref, counts_ref, depth = \
            _single_device_oracle(pts, weights, mpb, dims)
        skel = sharded_box_skeleton(
            jnp.asarray(codes_s), jnp.asarray(leaf_ref),
            counts_ref, mesh, dimensions=dims, depth=depth)
        tree = build_tree(pts, max_particles_in_box=mpb)
        ntable_rows = sharded_neighbor_table(tree, skel, mesh)

        res = sharded_l3l4_edges(tree, skel, ntable_rows, mesh)

        def union(pair):
            keys, counts = (np.asarray(a) for a in pair)
            return np.sort(np.concatenate(
                [keys[r, :counts[r]] for r in range(keys.shape[0])]))

        trav = build_traversal(tree)

        # slnws: starts indexed by box id
        starts = np.asarray(trav.same_level_non_well_sep_boxes_starts)
        lists = np.asarray(trav.same_level_non_well_sep_boxes_lists)
        rows = np.repeat(np.arange(tree.nboxes, dtype=np.int64),
                         np.diff(starts))
        np.testing.assert_array_equal(
            union(res["slnws"]), np.sort((rows << 32) | lists))

        # List 3: per source level over its own target-box list
        ref = [np.zeros(0, np.int64)]
        for ls, bl in enumerate(trav.from_sep_smaller_by_level):
            starts = np.asarray(bl.starts)
            lists = np.asarray(bl.lists)
            tb = np.asarray(
                trav.target_boxes_sep_smaller_by_source_level[ls]
            ).astype(np.int64)
            rows = np.repeat(np.arange(len(tb)), np.diff(starts))
            ref.append((tb[rows] << 32) | lists)
        np.testing.assert_array_equal(
            union(res["l3"]), np.sort(np.concatenate(ref)))

        # List 4: over target_or_target_parent rows
        starts = np.asarray(trav.from_sep_bigger_starts)
        lists = np.asarray(trav.from_sep_bigger_lists)
        totp = np.asarray(
            trav.target_or_target_parent_boxes).astype(np.int64)
        rows = np.repeat(np.arange(len(totp)), np.diff(starts))
        np.testing.assert_array_equal(
            union(res["l4"]), np.sort((totp[rows] << 32) | lists))


def test_sharded_edges_to_owner_csr(mesh):
    """Owner exchange + per-rank CSR assembly: after routing, every key
    sits on the rank owning its target row, and each owned box's CSR
    slice equals the single-device traversal's per-box list."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import (
        sharded_box_skeleton, sharded_edges_to_owner_csr,
        sharded_l1_edges, sharded_l2_edges, sharded_neighbor_table)
    from boxtree_tpu.traversal import build_traversal

    rng = np.random.default_rng(103)
    dims, n, mpb = 3, 1 << 13, 40
    pts = np.concatenate([
        rng.random((dims, n // 2)) * 0.04,
        rng.random((dims, n // 2)),
    ], axis=1)
    weights = np.ones(n, np.int64)
    codes_s, order, leaf_ref, counts_ref, depth = \
        _single_device_oracle(pts, weights, mpb, dims)
    skel = sharded_box_skeleton(
        jnp.asarray(codes_s), jnp.asarray(leaf_ref),
        counts_ref, mesh, dimensions=dims, depth=depth)
    tree = build_tree(pts, max_particles_in_box=mpb)
    ntable_rows = sharded_neighbor_table(tree, skel, mesh)
    trav = build_traversal(tree)
    box_id = np.asarray(skel["box_id"])

    def check(pair, ref_starts, ref_lists, ref_rows):
        # per-box reference lists
        ref_starts = np.asarray(ref_starts)
        ref_lists = np.asarray(ref_lists)
        ref_rows = np.asarray(ref_rows).astype(np.int64)
        per_box = {int(b): np.sort(
            ref_lists[ref_starts[i]:ref_starts[i + 1]])
            for i, b in enumerate(ref_rows)}

        merged, starts, totals, ok = sharded_edges_to_owner_csr(
            pair[0], pair[1], tree, skel, mesh)
        assert ok
        merged = np.asarray(merged)
        starts = np.asarray(starts)
        totals = np.asarray(totals)
        seen = 0
        for r in range(8):
            owned = box_id[r][box_id[r] >= 0]
            ks = merged[r, :totals[r]]
            # every received key's target row is owned here
            assert np.isin(ks >> 32, owned).all()
            for i, b in enumerate(owned):
                got = np.sort(ks[starts[r, i]:starts[r, i + 1]]
                              & 0xFFFFFFFF)
                want = per_box.get(int(b), np.zeros(0, np.int64))
                np.testing.assert_array_equal(got, want)
                seen += len(got)
        assert seen == sum(len(v) for v in per_box.values())

    check(sharded_l1_edges(tree, skel, ntable_rows, mesh),
          trav.neighbor_source_boxes_starts,
          trav.neighbor_source_boxes_lists, trav.target_boxes)
    check(sharded_l2_edges(tree, skel, ntable_rows, mesh),
          trav.from_sep_siblings_starts,
          trav.from_sep_siblings_lists,
          trav.target_or_target_parent_boxes)


def test_sharded_traversal_lists(mesh):
    """End-to-end per-rank lists: grand totals of every list equal the
    single-device traversal's, and each rank's keys are owner-local."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import (
        sharded_box_skeleton, sharded_traversal_lists)
    from boxtree_tpu.traversal import build_traversal

    rng = np.random.default_rng(109)
    dims, n, mpb = 2, 1 << 12, 25
    pts = np.concatenate([
        rng.random((dims, n // 2)) * 0.04,
        rng.random((dims, n // 2)),
    ], axis=1)
    weights = np.ones(n, np.int64)
    codes_s, order, leaf_ref, counts_ref, depth = \
        _single_device_oracle(pts, weights, mpb, dims)
    skel = sharded_box_skeleton(
        jnp.asarray(codes_s), jnp.asarray(leaf_ref),
        counts_ref, mesh, dimensions=dims, depth=depth)
    tree = build_tree(pts, max_particles_in_box=mpb)
    trav = build_traversal(tree)
    box_id = np.asarray(skel["box_id"])

    lists = sharded_traversal_lists(tree, skel, mesh)

    want = {
        "slnws": len(np.asarray(
            trav.same_level_non_well_sep_boxes_lists)),
        "l1": len(np.asarray(trav.neighbor_source_boxes_lists)),
        "l2": len(np.asarray(trav.from_sep_siblings_lists)),
        "l3": sum(len(np.asarray(bl.lists))
                  for bl in trav.from_sep_smaller_by_level),
        "l4": len(np.asarray(trav.from_sep_bigger_lists)),
    }
    for name, (merged, starts, totals) in lists.items():
        merged = np.asarray(merged)
        totals = np.asarray(totals)
        assert totals.sum() == want[name], name
        for r in range(8):
            owned = box_id[r][box_id[r] >= 0]
            assert np.isin(
                merged[r, :totals[r]] >> 32, owned).all(), name


def test_sharded_build_tree_separate_targets(mesh):
    """Separate-target trees build sharded, field-for-field equal to
    the single-device srcntgt-merged build (reference merge:
    ``boxtree/tree_build.py:324-403``), and drive the counting FMM to
    exact completeness."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import sharded_build_tree

    rng = np.random.default_rng(73)
    dims, mpb = 3, 30
    nsrc, ntgt = 5 << 10, 3 << 10
    src = rng.random((dims, nsrc))
    tgt = np.concatenate([
        rng.random((dims, ntgt // 2)) * 0.1 + 0.4,
        rng.random((dims, ntgt // 2)),
    ], axis=1)

    tree_s = sharded_build_tree(src, mesh, targets=tgt,
                                max_particles_in_box=mpb)
    tree = build_tree(src, targets=tgt, max_particles_in_box=mpb)
    _assert_trees_equal(tree_s, tree)
    np.testing.assert_array_equal(
        np.asarray(tree_s.targets), np.asarray(tree.targets))
    np.testing.assert_array_equal(
        np.asarray(tree_s.box_target_counts_nonchild),
        np.asarray(tree.box_target_counts_nonchild))

    from boxtree_tpu.fmm import drive_fmm
    from boxtree_tpu.models.constant_one import (
        ConstantOneExpansionWrangler,
        ConstantOneTreeIndependentDataForWrangler)
    from boxtree_tpu.traversal import build_traversal
    trav = build_traversal(tree_s)
    pot = drive_fmm(ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav),
        (jnp.ones(nsrc),))
    np.testing.assert_allclose(np.asarray(pot), nsrc, rtol=0, atol=1e-9)


@pytest.mark.parametrize("which", ["target", "both"])
def test_sharded_build_tree_extents(mesh, which):
    """Extent trees (radii + stick-out) build sharded, field-for-field
    equal to the single-device build: with-extent split rule, the
    (masked code, leaf level) re-sort, per-kind nonchild counts and
    box bounding boxes (reference: ``tree_build_kernels.py:388-452``,
    ``:1013-1164``)."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.parallel.shard_build import sharded_build_tree

    rng = np.random.default_rng(79)
    dims, mpb = 3, 30
    nsrc, ntgt = 3 << 10, 1 << 10
    src = rng.random((dims, nsrc))
    tgt = rng.random((dims, ntgt))
    tgt_r = 0.02 * rng.random(ntgt)
    src_r = 0.01 * rng.random(nsrc) if which == "both" else None

    kw = dict(targets=tgt, target_radii=tgt_r, source_radii=src_r,
              stick_out_factor=0.25, max_particles_in_box=mpb)
    tree_s = sharded_build_tree(src, mesh, **kw)
    tree = build_tree(src, **kw)
    _assert_trees_equal(tree_s, tree)
    for field in ("targets", "box_target_counts_nonchild",
                  "source_radii", "target_radii"):
        a, b = getattr(tree_s, field), getattr(tree, field)
        if b is None:
            assert a is None, field
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=field)
    for field in ("box_source_bounding_box_min",
                  "box_target_bounding_box_max"):
        np.testing.assert_allclose(
            np.asarray(getattr(tree_s, field)),
            np.asarray(getattr(tree, field)), rtol=1e-13,
            err_msg=field)
