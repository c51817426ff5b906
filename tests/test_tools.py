"""Tool tests: the hypercube all-reduce schedule simulated in pure Python
for 1..17 ranks (mirrors ``test/test_tools.py:54-97``)."""

import numpy as np
import pytest

from boxtree_tpu.utils.tools import AllReduceCommPattern


@pytest.mark.parametrize("size", range(1, 18))
def test_allreduce_comm_pattern(size):
    # Each rank starts with {rank}; simulate exchanges; all ranks must
    # end up with the full set.
    data = [{r} for r in range(size)]
    patterns = [AllReduceCommPattern(r, size) for r in range(size)]
    nrounds = patterns[0].nrounds()
    for _ in range(nrounds):
        incoming = [set() for _ in range(size)]
        for r in range(size):
            for snk in patterns[r].sinks():
                incoming[snk] |= data[r]
        for r in range(size):
            # sanity: senders to r claim r as sink
            for src in patterns[r].sources():
                assert r in patterns[src].sinks()
            data[r] |= incoming[r]
        for r in range(size):
            patterns[r].advance()
    for r in range(size):
        assert data[r] == set(range(size)), (size, r, data[r])
        assert patterns[r].done()


def test_builder_wrappers_and_timer():
    # class-style wrappers mirror the reference entry points
    from boxtree_tpu import TreeBuilder
    from boxtree_tpu.traversal import FMMTraversalBuilder
    from boxtree_tpu.utils.tools import StageTimer

    rng = np.random.default_rng(2)
    pts = rng.random((2, 500))
    tree = TreeBuilder()(pts, max_particles_in_box=30)
    trav = FMMTraversalBuilder(well_sep_is_n_away=1)(tree)
    assert trav.well_sep_is_n_away == 1
    assert trav.tree is tree

    timer = StageTimer()
    with timer("stage_a"):
        sum(range(1000))
    assert timer.timings["stage_a"] >= 0.0


def test_drive_fmm_timing_data():
    from boxtree_tpu import build_tree
    from boxtree_tpu.fmm import drive_fmm
    from boxtree_tpu.models.constant_one import (
        ConstantOneExpansionWrangler,
        ConstantOneTreeIndependentDataForWrangler,
    )
    from boxtree_tpu.traversal import build_traversal

    rng = np.random.default_rng(3)
    pts = rng.random((2, 1000))
    tree = build_tree(pts, max_particles_in_box=30)
    trav = build_traversal(tree)
    w = ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav)
    timing = {}
    pot = np.asarray(drive_fmm(w, (np.ones(1000),), timing_data=timing))
    assert (pot == 1000).all()
    assert set(timing) == {
        "form_multipoles", "coarsen_multipoles", "eval_direct",
        "multipole_to_local", "eval_multipoles", "form_locals",
        "refine_locals", "eval_locals"}
