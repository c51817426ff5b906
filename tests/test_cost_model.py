"""Cost model tests (mirror the op-count agreement oracle of
``test/test_cost_model.py:508-`` and the calibration fit)."""

import numpy as np
import pytest

from boxtree_tpu import build_tree
from boxtree_tpu.cost.model import (
    FMMCostModel,
    make_taylor_translation_cost_model,
)
from boxtree_tpu.traversal import build_traversal
from boxtree_tpu.utils.particles import make_normal_particle_array


@pytest.fixture(scope="module")
def trav():
    pts = make_normal_particle_array(4000, 2, np.float64)
    tree = build_tree(pts, max_particles_in_box=30)
    return build_traversal(tree)


def test_cost_per_stage_op_counts(trav):
    """With unit calibration and order 0 (1 coefficient), every stage
    cost is an exact, independently countable operation count."""
    model = FMMCostModel(lambda dim, nl: make_taylor_translation_cost_model(0, nl))
    orders = {lev: 0 for lev in range(trav.tree.nlevels)}
    costs = model.cost_per_stage(trav, orders)

    tree = trav.tree
    tgt_cnt = np.asarray(tree.box_target_counts_nonchild)
    src_cnt = np.asarray(tree.box_source_counts_nonchild)

    assert costs["form_multipoles"] == tree.nsources
    assert costs["eval_locals"] == tree.ntargets

    # p2p: every (target particle, source particle) pair over list 1
    starts = np.asarray(trav.neighbor_source_boxes_starts)
    lists = np.asarray(trav.neighbor_source_boxes_lists)
    tb = np.asarray(trav.target_boxes)
    expected_p2p = 0
    for i, b in enumerate(tb):
        expected_p2p += tgt_cnt[b] * src_cnt[lists[starts[i]:starts[i+1]]].sum()
    assert costs["eval_direct"] == expected_p2p

    # m2l: one op per list-2 entry
    assert costs["multipole_to_local"] == len(
        np.asarray(trav.from_sep_siblings_lists))

    # l2l: one per non-root target-or-target-parent box
    totp = np.asarray(trav.target_or_target_parent_boxes)
    lev = np.asarray(tree.box_levels)
    assert costs["refine_locals"] == (lev[totp] > 0).sum()

    # per-box costs sum to per-stage totals
    per_box = model.cost_per_box(trav, orders)
    assert np.isclose(per_box.sum(), sum(costs.values()))


def test_calibration_roundtrip(trav):
    model = FMMCostModel()
    orders = {lev: 3 for lev in range(trav.tree.nlevels)}
    counts = model.cost_per_stage(trav, orders)
    # synthetic timings: every stage runs at 2.5 s per op-count
    timings = {k: 2.5 * v for k, v in counts.items()}
    params = model.estimate_calibration_params([counts], [timings])
    for v in params.values():
        assert np.isclose(v, 2.5)
    calibrated = model.cost_per_stage(trav, orders, params)
    for k in counts:
        assert np.isclose(calibrated[k], 2.5 * counts[k])
