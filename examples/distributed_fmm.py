"""Distributed FMM over a device mesh — the analogue of running the
reference under ``mpiexec`` (``boxtree/distributed``), with
``jax.sharding.Mesh`` ranks instead of MPI ranks.

Runs the fully sharded pipeline (distributed sample sort -> per-shard
tree build -> per-rank interaction lists -> SPMD FMM step with a
hypercube multipole exchange) and checks the result against a
single-device run.

On a machine without multiple accelerators, request a virtual 8-device
CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/distributed_fmm.py
"""

import numpy as np

import boxtree_tpu  # noqa: F401  (must import before jax init)
import jax
from jax.sharding import Mesh

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.laplace import make_laplace_wrangler
from boxtree_tpu.parallel.sharded_runner import ShardedFMMRunner
from boxtree_tpu.traversal import build_traversal


def main():
    devs = jax.devices()
    nranks = max(1, 1 << (len(devs).bit_length() - 1))  # power of two
    mesh = Mesh(np.array(devs[:nranks]), ("ranks",))
    print(f"mesh: {nranks} x {devs[0].platform}")

    n = 1 << 14
    rng = np.random.default_rng(42)
    pts = rng.random((3, n))
    q = rng.standard_normal(n)

    # distributed: sharded build + per-rank lists + SPMD step;
    # local_particles keeps per-rank memory ~n/nranks
    runner = ShardedFMMRunner(
        mesh, pts, max_particles_in_box=30,
        local_particles=nranks > 1,
        wrangler_factory=lambda t: make_laplace_wrangler(t, order=6))
    pot = np.asarray(runner.drive_dfmm(q))

    # single-device reference
    tree = build_tree(pts, max_particles_in_box=30)
    trav = build_traversal(tree)
    ref = np.asarray(drive_fmm(
        make_laplace_wrangler(trav, order=6), (q,)))

    err = np.abs(pot - ref).max() / np.abs(ref).max()
    print(f"distributed vs single-device rel l_inf: {err:.3e}")
    assert err < 1e-12
    print("distributed FMM check passed (< 1e-12)")


if __name__ == "__main__":
    main()
