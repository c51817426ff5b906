"""End-to-end demo: build a 2D quadtree over 10^5 uniform random points,
generate the FMM traversal, and run a counting FMM.

Mirrors the reference's ``examples/demo.py:36-40`` (Config A of
BASELINE.md).  Run with ``JAX_PLATFORMS=cpu python examples/demo.py`` on a
CPU-only machine.
"""

import numpy as np

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.constant_one import (
    ConstantOneExpansionWrangler,
    ConstantOneTreeIndependentDataForWrangler,
)
from boxtree_tpu.traversal import build_traversal


def main():
    rng = np.random.default_rng(15)
    nparticles = 10**5
    particles = rng.random((2, nparticles))

    tree = build_tree(particles, max_particles_in_box=30)
    print(f"tree: {tree.nboxes} boxes, {tree.nlevels} levels, "
          f"{tree.nsources} particles")

    trav = build_traversal(tree)
    print(f"traversal: {len(np.asarray(trav.neighbor_source_boxes_lists))} "
          f"list-1 entries, "
          f"{len(np.asarray(trav.from_sep_siblings_lists))} list-2 entries, "
          f"{sum(bl.count for bl in trav.from_sep_smaller_by_level)} "
          f"list-3 entries, "
          f"{len(np.asarray(trav.from_sep_bigger_lists))} list-4 entries")

    wrangler = ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav)
    pot = np.asarray(drive_fmm(wrangler, (np.ones(nparticles),)))
    ok = (pot == nparticles).all()
    print(f"counting FMM: all potentials == {nparticles}: {ok}")
    if not ok:
        raise SystemExit(
            f"MISMATCH: {np.unique(pot[pot != nparticles])}")


if __name__ == "__main__":
    main()
