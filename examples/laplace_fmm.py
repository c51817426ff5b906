"""End-to-end 2D Laplace FMM demo: build tree + traversal, run the native
complex-series Laplace wrangler, compare against direct summation.

Run with ``JAX_PLATFORMS=cpu python examples/laplace_fmm.py`` for CPU.
"""

import numpy as np

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.laplace import (
    Laplace2DExpansionWrangler,
    LaplaceTreeIndependentDataForWrangler,
)
from boxtree_tpu.traversal import build_traversal


def main():
    rng = np.random.default_rng(11)
    nparticles = 20000
    particles = rng.random((2, nparticles))
    charges = rng.standard_normal(nparticles)

    tree = build_tree(particles, max_particles_in_box=40)
    trav = build_traversal(tree)
    print(f"tree: {tree.nboxes} boxes, {tree.nlevels} levels")

    wrangler = Laplace2DExpansionWrangler(
        LaplaceTreeIndependentDataForWrangler(2, order=20), trav)
    pot = np.asarray(drive_fmm(wrangler, (charges,))).real

    # spot-check 500 targets against direct summation
    idx = rng.choice(nparticles, 500, replace=False)
    dx = particles[0][idx, None] - particles[0][None, :]
    dy = particles[1][idx, None] - particles[1][None, :]
    r2 = dx * dx + dy * dy
    g = 0.5 * np.log(np.where(r2 > 0, r2, 1.0))
    ref = g @ charges

    rel_err = np.max(np.abs(pot[idx] - ref)) / np.max(np.abs(ref))
    print(f"rel l_inf error vs direct summation (500 targets): {rel_err:.2e}")
    if rel_err > 1e-5:
        raise SystemExit("accuracy check FAILED")
    print("accuracy check passed (< 1e-5)")


if __name__ == "__main__":
    main()
