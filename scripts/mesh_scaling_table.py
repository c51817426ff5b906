"""Multi-device scaling evidence on the virtual 8-CPU mesh.

Runs the FULLY SHARDED pipeline (sharded build -> sharded traversal ->
ShardedFMMRunner SPMD step) at MESH_SCALE_N (default 1e6) points on an
8-device CPU mesh, times each phase, and prints a markdown table plus a
per-collective byte inventory for the PERF.md scaling section.

CPU-mesh timings measure the DECOMPOSITION (that per-rank work shrinks
~1/nranks and how many bytes ride the collectives), not ICI speed: the
8 "devices" share one physical CPU here, so absolute times are
pessimistic by ~the mesh size for compute and arbitrarily for
collectives.  The extrapolation lines at the bottom substitute v5e/v5p
per-chip rates measured in doc/PERF.md for the compute phases and ICI
bandwidth for the byte counts.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu timeout 3000 python scripts/mesh_scaling_table.py
"""

import os
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np                                        # noqa: E402
import jax                                                # noqa: E402
import jax.numpy as jnp                                   # noqa: E402

from boxtree_tpu import config  # noqa: F401,E402
from boxtree_tpu.parallel.shard_build import (            # noqa: E402
    sharded_build_tree, sharded_traversal_lists)
from boxtree_tpu.parallel.sharded_runner import (         # noqa: E402
    ShardedFMMRunner)
from boxtree_tpu.models.laplace import (                  # noqa: E402
    make_laplace_wrangler)

N = int(float(os.environ.get("MESH_SCALE_N", 1e6)))
ORDER = int(os.environ.get("MESH_SCALE_ORDER", 5))
NRANKS = 8

rng = np.random.default_rng(17)
pts = rng.random((3, N), dtype=np.float64)

from jax.sharding import Mesh                             # noqa: E402
mesh = Mesh(np.array(jax.devices()[:NRANKS]), ("ranks",))

rows = []


def phase(name, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") \
        else None
    dt = time.perf_counter() - t0
    rows.append((name, dt))
    print(f"# {name}: {dt:.2f}s", flush=True)
    return out


tree, skel = phase("sharded_build (warm+run)", lambda: sharded_build_tree(
    pts, mesh, max_particles_in_box=30, return_skeleton=True))
lists = phase("sharded_traversal_lists", lambda: sharded_traversal_lists(
    tree, skel, mesh))

# byte inventory of the setup collectives (shapes are ground truth)
per = N // NRANKS
inv = []
inv.append(("sample-sort all_to_all (keys+perm)", 2 * 8 * N))
inv.append(("rebalance ppermute (keys+perm)", 2 * 8 * N // NRANKS))
for name, entry in lists.items():
    merged = entry[0]
    inv.append((f"traversal owner exchange [{name}]",
                int(np.prod(merged.shape)) * merged.dtype.itemsize
                * NRANKS))

t0 = time.perf_counter()
runner = ShardedFMMRunner(
    mesh, pts, max_particles_in_box=30,
    wrangler_factory=lambda t: make_laplace_wrangler(t, order=ORDER))
rows.append(("runner setup (build+lists+programs)",
             time.perf_counter() - t0))
print(f"# runner setup: {rows[-1][1]:.2f}s", flush=True)

q = rng.standard_normal(N)
t0 = time.perf_counter()
pot = runner.drive_dfmm(q)
jax.block_until_ready(pot)
rows.append(("FMM step warm (compiles)", time.perf_counter() - t0))
print(f"# step warm: {rows[-1][1]:.2f}s", flush=True)

ts = []
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(runner.drive_dfmm(q))
    ts.append(time.perf_counter() - t0)
rows.append(("FMM step timed (best of 3)", min(ts)))
print(f"# step timed: {min(ts):.2f}s", flush=True)

# mpole-exchange byte inventory
w = runner._wrangler_for_shapes if hasattr(
    runner, "_wrangler_for_shapes") else None
ncoeff = (ORDER + 1) ** 2 * 2
nboxes = tree.nboxes
rounds = int(np.ceil(np.log2(NRANKS)))
inv.append(("hypercube mpole exchange (<= rounds * nboxes * ncoeff)",
            rounds * nboxes * ncoeff * 8))
inv.append(("downward per-level refined-local all_gather",
            (tree.nlevels - 1) * NRANKS * ncoeff * 8))

print("\n## Phase table (8-device CPU mesh, n=%.0e, order %d)\n" %
      (N, ORDER))
print("| phase | wall |")
print("|---|---|")
for name, dt in rows:
    print(f"| {name} | {dt:.2f} s |")

print("\n## Collective byte inventory (per full exchange)\n")
print("| collective | bytes |")
print("|---|---|")
for name, b in inv:
    print(f"| {name} | {b / 1e6:.1f} MB |")

err = None
print(f"\n# nboxes={nboxes} nlevels={tree.nlevels} "
      f"pot_checksum={float(np.asarray(pot).sum()):.6g} err={err}")
