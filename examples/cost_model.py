"""Calibrate the FMM cost model against measured per-stage wall times
(mirrors the reference's ``examples/cost_model.py:37-122``)."""

import numpy as np

from boxtree_tpu import build_tree
from boxtree_tpu.cost.model import FMMCostModel
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.laplace import make_laplace_wrangler
from boxtree_tpu.traversal import build_traversal


def main():
    rng = np.random.default_rng(4)
    model = FMMCostModel()
    model_results, timing_results = [], []

    for nparticles in (10000, 20000):
        pts = rng.random((2, nparticles))
        charges = rng.standard_normal(nparticles)
        tree = build_tree(pts, max_particles_in_box=40)
        trav = build_traversal(tree)
        wrangler = make_laplace_wrangler(trav, order=10)
        orders = {lev: 10 for lev in range(tree.nlevels)}

        drive_fmm(wrangler, (charges,))          # warm up (compile)
        timing = {}
        drive_fmm(wrangler, (charges,), timing_data=timing)

        model_results.append(model.cost_per_stage(trav, orders))
        timing_results.append(timing)
        print(f"n={nparticles}: " + ", ".join(
            f"{k}={v * 1e3:.1f}ms" for k, v in sorted(timing.items())))

    params = model.estimate_calibration_params(
        model_results, timing_results)
    print("calibrated params (s/op):")
    for k, v in sorted(params.items()):
        print(f"  {k} = {v:.3e}")

    calibrated = model.cost_per_stage(
        trav, orders, calibration_params=params)
    predicted = sum(calibrated.values())
    measured = sum(timing.values())
    print(f"predicted total {predicted:.3f}s vs measured {measured:.3f}s")


if __name__ == "__main__":
    main()
