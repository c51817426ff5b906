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


def test_device_and_python_models_agree(trav):
    # device (jnp) and host (numpy) flavors agree, per stage and per box
    # (mirrors test/test_cost_model.py's cl-vs-python comparisons)
    from boxtree_tpu.cost.model import PythonFMMCostModel
    orders = {lev: 4 for lev in range(trav.tree.nlevels)}
    dev = FMMCostModel()
    host = PythonFMMCostModel()
    cd = dev.cost_per_stage(trav, orders)
    ch = host.cost_per_stage(trav, orders)
    assert set(cd) == set(ch)
    for k in cd:
        assert np.isclose(cd[k], ch[k]), (k, cd[k], ch[k])
    pb_d = np.asarray(dev.cost_per_box(trav, orders))
    pb_h = host.cost_per_box(trav, orders)
    assert np.allclose(pb_d, pb_h)
    assert np.isclose(dev.aggregate_over_boxes(dev.cost_per_box(trav, orders)),
                      host.aggregate_over_boxes(pb_h))


class OpCountingTranslationCostModel:
    """Assigns a cost of 1 to each operation (the reference's oracle
    model, ``test/test_cost_model.py:508-530``)."""

    def __init__(self, dim, nlevels):
        pass

    def with_orders(self, level_to_order):
        return self

    @staticmethod
    def p2l(level):
        return 1

    l2p = p2l
    p2m = p2l
    m2p = p2l

    @staticmethod
    def m2m(src_level, tgt_level):
        return 1

    l2l = m2m
    m2l = m2m


def test_op_counts_agree_with_constantone_wrangler():
    """The model's op counts (unit calibration, op-counting translation
    model) equal the counting wrangler's *executed* op counts: each
    stage is driven with unit inputs and its output total is exactly the
    number of elementary operations performed (mirrors
    ``test/test_cost_model.py:531-``)."""
    import jax.numpy as jnp

    from boxtree_tpu.models.constant_one import (
        ConstantOneExpansionWrangler,
        ConstantOneTreeIndependentDataForWrangler,
    )
    from boxtree_tpu.utils.particles import make_normal_particle_array

    sources = make_normal_particle_array(2000, 3, np.float64, seed=16)
    targets = make_normal_particle_array(2000, 3, np.float64, seed=19)
    tree = build_tree(sources, targets=targets, max_particles_in_box=30)
    trav = build_traversal(tree)

    model = FMMCostModel(
        translation_cost_model_factory=OpCountingTranslationCostModel)
    orders = {lev: 1 for lev in range(tree.nlevels)}
    modeled = model.cost_per_stage(trav, orders)

    w = ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav)
    ones_src = jnp.ones(tree.nsources)
    ones_boxes = jnp.ones(tree.nboxes)

    # executed counts: drive each stage with unit inputs; the summed
    # output counts one per elementary (particle/coeff) operation
    mp = w.form_multipoles(None, trav.source_boxes, (ones_src,))
    assert float(mp.sum()) == modeled["form_multipoles"] == tree.nsources

    pot = w.eval_direct(trav.target_boxes,
                        trav.neighbor_source_boxes_starts,
                        trav.neighbor_source_boxes_lists, (ones_src,))
    assert float(pot.sum()) == modeled["eval_direct"]

    loc = w.multipole_to_local(None, trav.target_or_target_parent_boxes,
                               trav.from_sep_siblings_starts,
                               trav.from_sep_siblings_lists, ones_boxes)
    assert float(loc.sum()) == modeled["multipole_to_local"] \
        == trav.from_sep_siblings_lists.shape[0]

    pot = w.eval_multipoles(trav.target_boxes_sep_smaller_by_source_level,
                            trav.from_sep_smaller_by_level, ones_boxes)
    assert float(pot.sum()) == modeled["eval_multipoles"]

    loc = w.form_locals(None, trav.target_or_target_parent_boxes,
                        trav.from_sep_bigger_starts,
                        trav.from_sep_bigger_lists, (ones_src,))
    assert float(loc.sum()) == modeled["form_locals"]

    pot = w.eval_locals(None, trav.target_boxes, ones_boxes)
    assert float(pot.sum()) == modeled["eval_locals"] == tree.ntargets

    # structural counts for the two cascaded stages
    lev = np.asarray(tree.box_levels)
    parents = np.asarray(tree.box_parent_ids)
    spb_mask = np.zeros(tree.nboxes, bool)
    spb_mask[np.asarray(trav.source_parent_boxes)] = True
    nlinks = int(spb_mask[parents[np.arange(1, tree.nboxes)]].sum())
    assert modeled["coarsen_multipoles"] == nlinks

    totp = np.asarray(trav.target_or_target_parent_boxes)
    assert modeled["refine_locals"] == int((lev[totp] > 0).sum())

    # per-box distribution sums to the per-stage total
    per_box = model.cost_per_box(trav, orders)
    assert np.isclose(model.aggregate_over_boxes(per_box),
                      sum(modeled.values()))
