"""Masked-source traversal inputs (the analogue of the reference's
``generate_local_travs``: ``boxtree/distributed/local_traversal.py:34-62``
masking ``sources_parents_and_targets_builder``,
``boxtree/traversal.py:1975-1986``).

Oracle (no-double-counting decomposition): with the counting kernel and
responsible-source masks that PARTITION the source boxes across ranks,
the multipole-mediated part of each rank's potential covers exactly its
own sources, while the direct (P2P / P2L) parts are computed in full by
every rank.  Hence

    sum_r drive(mask_r)  -  (nranks - 1) * drive(empty mask)
        == nsources      (exactly)

because drive(empty mask) is precisely the direct-only part.
"""

import jax.numpy as jnp
import numpy as np

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.constant_one import (
    ConstantOneExpansionWrangler,
    ConstantOneTreeIndependentDataForWrangler,
)
from boxtree_tpu.parallel.partition import partition_ranks
from boxtree_tpu.traversal import build_traversal


def _drive(tree, mask, parent_mask, n):
    trav = build_traversal(
        tree, source_boxes_mask=mask,
        source_parent_boxes_mask=parent_mask)
    w = ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav)
    return np.asarray(drive_fmm(w, (jnp.ones(n),)))


def test_masked_traversal_partition_decomposition():
    rng = np.random.default_rng(23)
    n, nranks = 4096, 3
    pts = rng.random((3, n))
    tree = build_tree(pts, max_particles_in_box=30)
    trav_full = build_traversal(tree)

    from boxtree_tpu.cost.model import FMMCostModel
    orders = {lev: 3 for lev in range(tree.nlevels)}
    cost = FMMCostModel().cost_per_box(trav_full, orders)
    rp = partition_ranks(cost, trav_full, nranks)

    resp = rp.responsible_masks()                    # (nranks, nboxes)
    # ancestors (strict) of each rank's responsible set
    parents = np.asarray(tree.box_parent_ids)
    anc = np.zeros_like(resp)
    for r in range(nranks):
        m = resp[r].copy()
        frontier = np.unique(parents[np.flatnonzero(m)])
        while True:
            new = frontier[~anc[r, frontier]]
            new = new[new != 0] if not anc[r, 0] else new
            if len(new) == 0 and anc[r, 0]:
                break
            anc[r, frontier] = True
            nxt = np.unique(parents[frontier])
            if anc[r, nxt].all():
                break
            frontier = nxt

    # each source box is responsible to exactly one rank
    assert (resp.sum(axis=0) == 1).all()

    pots = [_drive(tree, resp[r], anc[r] | resp[r], n)
            for r in range(nranks)]
    direct_only = _drive(tree, np.zeros(tree.nboxes, bool),
                         np.zeros(tree.nboxes, bool), n)
    total = sum(pots) - (nranks - 1) * direct_only
    np.testing.assert_allclose(total, n, rtol=0, atol=1e-9)

    # sanity: a masked traversal really restricts the box lists
    trav_r = build_traversal(tree, source_boxes_mask=resp[0])
    src_flags = np.zeros(tree.nboxes, bool)
    src_flags[np.asarray(trav_full.source_boxes)] = True
    got = np.asarray(trav_r.source_boxes)
    assert set(got) == set(np.flatnonzero(src_flags & resp[0]))
