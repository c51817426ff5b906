"""End-to-end sharded FMM runner tests on the virtual 8-device CPU mesh.

The oracles are the reference's distributed oracles
(``test/test_distributed.py:69-269``): the counting FMM must yield
exactly ``nsources`` everywhere and a real-kernel distributed run must
match the single-device ``drive_fmm`` result — here run through the
FULLY SHARDED pipeline (sharded build -> sharded traversal -> SPMD
step), with no replicated global traversal anywhere in the setup.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from boxtree_tpu.parallel.sharded_runner import ShardedFMMRunner

N = 2048


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("ranks",))


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(11)
    return rng.random((3, N))


@pytest.fixture(scope="module")
def single_device_laplace(pts):
    from boxtree_tpu import build_tree
    from boxtree_tpu.fmm import drive_fmm
    from boxtree_tpu.models.laplace import make_laplace_wrangler
    from boxtree_tpu.traversal import build_traversal

    rng = np.random.default_rng(3)
    q = rng.standard_normal(N)
    tree = build_tree(pts, max_particles_in_box=30)
    trav = build_traversal(tree)
    ref = np.asarray(drive_fmm(make_laplace_wrangler(trav, order=5), (q,)))
    return q, ref


@pytest.mark.smoke
def test_sharded_counting_fmm(mesh, pts):
    """Every target must see every source exactly once through the
    sharded pipeline (the reference's constant-one distributed oracle,
    ``test/test_distributed.py:182-269``)."""
    runner = ShardedFMMRunner(mesh, pts, max_particles_in_box=30)
    pot = np.asarray(runner.drive_dfmm(np.ones(N)))
    assert (pot == N).all()


@pytest.mark.parametrize("comm", ["hypercube", "allreduce"])
def test_sharded_laplace(mesh, pts, single_device_laplace, comm):
    from boxtree_tpu.models.laplace import make_laplace_wrangler

    q, ref = single_device_laplace
    runner = ShardedFMMRunner(
        mesh, pts, max_particles_in_box=30, communicate_mpoles=comm,
        wrangler_factory=lambda t: make_laplace_wrangler(t, order=5))
    dist = np.asarray(runner.drive_dfmm(q))
    err = np.abs(dist - ref).max() / np.abs(ref).max()
    assert err < 1e-12, err


def test_sharded_laplace_local_particles(mesh, pts,
                                         single_device_laplace):
    """local_particles mode: per-rank particle blocks extracted on
    device (no O(E)/O(n) host work), FMM result identical to the
    single-device run, and per-rank block memory well below the global
    particle footprint (the memory-scaling contract of the reference's
    ``generate_local_tree``, ``local_tree.py:198-495``)."""
    from boxtree_tpu.models.laplace import make_laplace_wrangler

    q, ref = single_device_laplace
    runner = ShardedFMMRunner(
        mesh, pts, max_particles_in_box=30, local_particles=True,
        wrangler_factory=lambda t: make_laplace_wrangler(t, order=5))
    dist = np.asarray(runner.drive_dfmm(q))
    err = np.abs(dist - ref).max() / np.abs(ref).max()
    assert err < 1e-12, err

    # SETUP memory contract (r5): the replicated global particle
    # blocks were never materialized — the per-rank blocks came by
    # exchange from the mesh-sharded coordinates — and the tree's
    # coordinate arrays stayed mesh-sharded end to end
    assert runner.wrangler._src_blocks is None
    assert len(runner.tree.sources.sharding.device_set) > 1

    # step-state memory: per-rank blocks must be far below the global
    # block footprint (halo overhead allows a generous factor)
    sb, tb = runner.wrangler.src_blocks, runner.wrangler.tgt_blocks
    global_bytes = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in (sb.points, sb.mask, sb.index,
                  tb.points, tb.mask, tb.index))
    nranks = mesh.devices.size
    assert runner.local_bytes_per_rank < 3 * global_bytes / nranks, \
        (runner.local_bytes_per_rank, global_bytes / nranks)


def test_sharded_dipoles_local_particles(mesh, pts):
    """Dipole sources exercise the dip-block gather path."""
    from boxtree_tpu import build_tree
    from boxtree_tpu.fmm import drive_fmm
    from boxtree_tpu.models.laplace import make_laplace_wrangler
    from boxtree_tpu.traversal import build_traversal

    rng = np.random.default_rng(5)
    q = rng.standard_normal(N)
    dip = rng.standard_normal((3, N))
    tree = build_tree(pts, max_particles_in_box=30)
    trav = build_traversal(tree)
    ref = np.asarray(drive_fmm(
        make_laplace_wrangler(trav, order=6, dipole_vec=dip), (q,)))

    runner = ShardedFMMRunner(
        mesh, pts, max_particles_in_box=30, local_particles=True,
        wrangler_factory=lambda t: make_laplace_wrangler(
            t, order=6, dipole_vec=dip))
    dist = np.asarray(runner.drive_dfmm(q))
    err = np.abs(dist - ref).max() / np.abs(ref).max()
    assert err < 1e-12, err


def test_sharded_runner_no_global_traversal(mesh, pts):
    """Setup must not hold a global traversal; per-rank list work is
    owner-split (every edge appears on exactly one rank)."""
    runner = ShardedFMMRunner(mesh, pts, max_particles_in_box=30)
    assert runner.traversal is None

    # per-rank edges, decoded: the union over ranks equals the
    # single-device List 1 exactly, and rank slices are disjoint
    from boxtree_tpu import build_tree
    from boxtree_tpu.traversal import build_traversal

    trav = build_traversal(build_tree(pts, max_particles_in_box=30))
    e1 = np.asarray(runner.e1)
    got = e1[e1[..., 0] >= 0]
    got_keys = np.sort(got[:, 0].astype(np.int64) * (1 << 32)
                       + got[:, 1])
    starts = np.asarray(trav.neighbor_source_boxes_starts)
    lists = np.asarray(trav.neighbor_source_boxes_lists)
    tb = np.asarray(trav.target_boxes)
    rows = np.repeat(np.arange(len(tb)), np.diff(starts))
    want_keys = np.sort(tb[rows].astype(np.int64) * (1 << 32) + lists)
    np.testing.assert_array_equal(got_keys, want_keys)


def test_cost_partition_skewed(mesh):
    """Cost-balanced ownership (the analogue of the reference's
    cost-weighted DFS partition, ``distributed/partition.py:60-121``):
    on a skewed distribution the per-rank P2P work spread must tighten
    vs equal-particle-count ownership, with the counting oracle intact.
    """
    rng = np.random.default_rng(23)
    n = 4096
    # 3/4 of the points clustered in a corner ball, rest uniform
    nc = 3 * n // 4
    cluster = 0.04 * rng.random((3, nc)) + 0.01
    rest = rng.random((3, n - nc))
    pts = np.concatenate([cluster, rest], axis=1)

    def work_spread(runner, order=8):
        """Per-rank total stage work (max/mean) off the routed edge
        slices + owned boxes, with the same weights the cost partition
        balances (P2P pairs, M2L coefficient products, M2P/P2L
        coefficient evaluations, per-box P2M/L2P) — the work a
        real-kernel wrangler performs per rank."""
        ns = np.asarray(runner.tree.box_source_counts_cumul)
        nt = np.asarray(runner.tree.box_target_counts_cumul)
        K = float((order + 1) ** 2)
        e = {k: np.asarray(getattr(runner, k))
             for k in ("e1", "e2", "e3", "e4")}
        resp = np.asarray(runner.resp_masks)
        per_rank = []
        for r in range(e["e1"].shape[0]):
            v1 = e["e1"][r][e["e1"][r, :, 0] >= 0]
            v2 = e["e2"][r][e["e2"][r, :, 0] >= 0]
            v3 = e["e3"][r][e["e3"][r, :, 0] >= 0]
            v4 = e["e4"][r][e["e4"][r, :, 0] >= 0]
            own = np.flatnonzero(resp[r])
            per_rank.append(
                float((nt[v1[:, 0]] * ns[v1[:, 1]]).sum())
                + K * K * len(v2)
                + K * float(nt[v3[:, 0]].sum())
                + K * float(ns[v4[:, 1]].sum())
                + K * float(ns[own].sum() + nt[own].sum()))
        per_rank = np.asarray(per_rank)
        return per_rank.max() / max(per_rank.mean(), 1.0)

    r_cnt = ShardedFMMRunner(mesh, pts, max_particles_in_box=30)
    r_cost = ShardedFMMRunner(mesh, pts, max_particles_in_box=30,
                              partition="cost")

    pot = np.asarray(r_cost.drive_dfmm(np.ones(n)))
    assert (pot == n).all()

    s_cnt, s_cost = work_spread(r_cnt), work_spread(r_cost)
    # equal-count ownership leaves the cluster's dense interactions on
    # few ranks; the cost partition must cut the imbalance (the excess
    # of max/mean over the perfect 1.0) by well over half.  Measured on
    # this configuration: 1.18 -> 1.01.
    assert s_cost - 1 < 0.3 * (s_cnt - 1), (s_cnt, s_cost)
