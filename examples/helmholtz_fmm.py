"""End-to-end 3D Helmholtz FMM demo: build tree + traversal, run the
native Gaunt-series wrangler, compare against direct summation.

On CPU this uses the complex wrangler; on accelerator backends the
factory auto-selects the complex-free real-pair wrangler (potentials
come back as (ntargets, 2) [re, im] lanes).

Run with ``JAX_PLATFORMS=cpu python examples/helmholtz_fmm.py`` for CPU.
"""

import numpy as np

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.helmholtz3d import make_helmholtz_wrangler
from boxtree_tpu.traversal import build_traversal


def main():
    rng = np.random.default_rng(13)
    nparticles = 4000
    k = 3.0
    particles = rng.random((3, nparticles))
    charges = rng.standard_normal(nparticles)

    tree = build_tree(particles, max_particles_in_box=30)
    trav = build_traversal(tree)
    print(f"tree: {tree.nboxes} boxes, {tree.nlevels} levels")

    wrangler = make_helmholtz_wrangler(trav, k, order=10)
    pot = np.asarray(drive_fmm(wrangler, (charges,)))
    if pot.ndim == 2:                    # real-pair wrangler lanes
        pot = pot[:, 0] + 1j * pot[:, 1]

    # spot-check 500 targets against direct summation
    idx = rng.choice(nparticles, 500, replace=False)
    d = particles[:, idx, None] - particles[:, None, :]
    r = np.sqrt((d * d).sum(axis=0))
    g = np.where(r > 0, np.exp(1j * k * np.where(r > 0, r, 1.0))
                 / np.where(r > 0, r, 1.0), 0.0)
    ref = g @ charges

    rel_err = np.max(np.abs(pot[idx] - ref)) / np.max(np.abs(ref))
    print(f"rel l_inf error vs direct summation (500 targets): "
          f"{rel_err:.2e}")
    if rel_err > 1e-5:
        raise SystemExit("accuracy check FAILED")
    print("accuracy check passed (< 1e-5)")


if __name__ == "__main__":
    main()
