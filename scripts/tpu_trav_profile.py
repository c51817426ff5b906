"""Per-stage TPU profile of build + traversal (BOXTREE_TPU_TRAV_TIMING).

Prints the '# build/trav <stage>: <t>s' lines from the instrumented
drivers for a warm run at TPU_PROF_N (default 2e6), then a second
timed run, then (budget permitting) the same at 1e7.

Run: timeout 3000 python scripts/tpu_trav_profile.py
"""

import os
import time

os.environ["BOXTREE_TPU_TRAV_TIMING"] = "1"
os.environ.setdefault("BOXTREE_TPU_CACHE",
                      os.path.expanduser("~/.cache/jax_tpu"))

import numpy as np                                       # noqa: E402
import jax                                               # noqa: E402

from boxtree_tpu import build_tree                       # noqa: E402
from boxtree_tpu.traversal import build_traversal        # noqa: E402

T0 = time.monotonic()
BUDGET = float(os.environ.get("TPU_PROF_BUDGET_S", 2700))


def _force(trav):
    # block_until_ready is a no-op through the axon tunnel; pull ONE
    # packed scalar concat over every output (bench.py does the same —
    # one round trip instead of one per array).
    import jax.numpy as jnp
    last = [x.ravel()[-1:].astype(jnp.int32)
            for x in (trav.neighbor_source_boxes_lists,
                      trav.neighbor_source_boxes_starts,
                      trav.same_level_non_well_sep_boxes_lists,
                      trav.from_sep_siblings_lists,
                      trav.from_sep_bigger_lists,
                      *(bl.lists for bl in trav.from_sep_smaller_by_level))
            if getattr(x, "size", 0)]
    if last:
        jax.device_get(jnp.concatenate(last))


WSN = int(os.environ.get("TPU_PROF_WSN", 1))


def run(n, seed):
    rng = np.random.default_rng(seed)
    pts = jax.device_put(rng.random((3, n), dtype=np.float32))
    t0 = time.perf_counter()
    tree = build_tree(pts, max_particles_in_box=30)
    trav = build_traversal(tree, well_sep_is_n_away=WSN)
    _force(trav)
    warm = time.perf_counter() - t0
    print(f"== n={n}: warm {warm:.1f}s (wsn={WSN})", flush=True)
    print("== timed run:", flush=True)
    t0 = time.perf_counter()
    tree = build_tree(pts, max_particles_in_box=30)
    trav = build_traversal(tree, well_sep_is_n_away=WSN)
    _force(trav)
    dt = time.perf_counter() - t0
    print(f"== n={n}: timed {dt:.3f}s, {n / 1e6 / dt:.3f} Mpts/s, "
          f"nboxes={tree.nboxes}", flush=True)


run(int(float(os.environ.get("TPU_PROF_N", 2e6))), 17)
if BUDGET - (time.monotonic() - T0) > 600:
    run(10_000_000, 7)
