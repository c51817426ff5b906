"""With-extent traversal tests: the "close" halves of Lists 3 and 4.

Two oracles, mirroring the reference test strategy (``test/test_fmm.py``
and ``test/test_traversal.py``):

1. A host-side numpy reimplementation of the reference's *stack walk*
   membership rules (``boxtree/traversal.py:607-875`` for List 3 with the
   three ``from_sep_smaller_crit`` flavors and the min-nsources forcing,
   ``:931-1146`` for List 4 with ``meets_sep_bigger_criterion``) — the
   device lists must match it pair for pair.
2. The constant-one counting FMM: with target extents the close lists
   route part of every interaction through direct evaluation, and every
   target must still receive exactly ``nsources``.
"""

import numpy as np
import pytest

from boxtree_tpu import build_tree
from boxtree_tpu.traversal import build_traversal
from boxtree_tpu.tree.containers import box_flags_enum as F
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.constant_one import (
    ConstantOneExpansionWrangler,
    ConstantOneTreeIndependentDataForWrangler,
)
from boxtree_tpu.utils.particles import (
    make_normal_particle_array,
    make_uniform_particle_array,
)

EPS = float(np.finfo(np.float64).eps)


def _make_extent_tree(dims, seed=11, nsources=1200, ntargets=1000,
                      sof=0.25, extent_norm="linf"):
    rng = np.random.default_rng(seed)
    sources = make_normal_particle_array(nsources, dims, np.float64, 1)
    targets = make_uniform_particle_array(ntargets, dims, np.float64, 2)
    target_radii = 2 ** rng.uniform(-10, 0, ntargets) * 0.03
    return build_tree(
        sources, targets=targets, target_radii=target_radii,
        stick_out_factor=sof, extent_norm=extent_norm,
        max_particles_in_box=20)


class _HostOracle:
    """Reference-rule membership walk on the host."""

    def __init__(self, tree, n_away, crit, min_nsources):
        self.n_away = n_away
        self.crit = crit
        self.min_nsources = min_nsources
        self.d = tree.dimensions
        self.flags = np.asarray(tree.box_flags)
        self.levels = np.asarray(tree.box_levels).astype(int)
        self.child = np.asarray(tree.box_child_ids)
        self.parent = np.asarray(tree.box_parent_ids)
        self.cumul = np.asarray(tree.box_source_counts_cumul)
        self.root = float(tree.root_extent)
        self.sof = float(tree.stick_out_factor)
        self.tbb_min = np.asarray(tree.box_target_bounding_box_min)
        self.tbb_max = np.asarray(tree.box_target_bounding_box_max)

        # integer cells + centers recomputed exactly like the device path
        pfx = np.asarray(tree.box_morton_prefixes)
        cells = np.zeros((self.d, len(pfx)), np.int64)
        for lev in range(64 // self.d):
            for ax in range(self.d):
                bit = (pfx >> (lev * self.d + (self.d - 1 - ax))) & 1
                cells[ax] |= bit << lev
        self.cells = cells
        bbox_min = (np.asarray(tree.box_centers)[:, 0]
                    - 0.5 * self.root)
        width = self.root * 2.0 ** -self.levels.astype(float)
        self.centers = bbox_min[:, None] + (cells + 0.5) * width

        self.lsb = tree.level_start_box_nrs
        self.nlevels = tree.nlevels

    def rad(self, lev):
        return self.root * 0.5 ** (lev + 1)

    def touch(self, a, b):
        la, lb = self.levels[a], self.levels[b]
        if la > lb:
            a, b, la, lb = b, a, lb, la
        s = lb - la
        ca, cb = self.cells[:, a], self.cells[:, b]
        return bool((((ca << s) <= cb + 1) & (cb <= ((ca + 1) << s))).all())

    def slnws(self, b):
        """Same-level boxes within n_away cells (excluding b)."""
        lev = self.levels[b]
        b0, b1 = self.lsb[lev], self.lsb[lev + 1]
        diff = np.abs(self.cells[:, b0:b1] - self.cells[:, b:b + 1])
        near = (diff <= self.n_away).all(axis=0)
        out = np.arange(b0, b1)[near]
        return out[out != b]

    def meets_smaller(self, b, w):
        src_rad = self.rad(self.levels[w])
        if self.crit == "static_linf":
            stick = (1 + self.sof) * self.rad(self.levels[b])
            l_inf = max(0.0, (np.abs(self.centers[:, b] - self.centers[:, w])
                              - stick - src_rad).max())
            return l_inf >= (2 - 8 * EPS) * src_rad
        if self.crit == "precise_linf":
            ec = 0.5 * (self.tbb_min[:, b] + self.tbb_max[:, b])
            rv = 0.5 * (self.tbb_max[:, b] - self.tbb_min[:, b])
            l_inf = max(0.0, (np.abs(ec - self.centers[:, w])
                              - rv - src_rad).max())
            return l_inf >= (2 - 8 * EPS) * src_rad
        stick = (1 + self.sof) * self.rad(self.levels[b])
        dist = np.sqrt(((self.centers[:, b] - self.centers[:, w]) ** 2)
                       .sum())
        rhs = dist - np.sqrt(self.d) * stick - src_rad
        return (2 - 8 * EPS) * src_rad <= rhs

    def meets_bigger(self, b, s):
        allowed = (3 * (1 + self.sof) * self.rad(self.levels[b])
                   + self.rad(self.levels[s]))
        l_inf = np.abs(self.centers[:, b] - self.centers[:, s]).max()
        return l_inf >= allowed * (1 - 8 * EPS)

    def forced(self, w):
        return self.cumul[w] < self.min_nsources

    def list3(self, target_boxes):
        """-> (far set of (b, w, src_level), close set of (b, w))."""
        far, close = set(), set()
        for b in target_boxes:
            for c in self.slnws(b):
                stack = [w for w in self.child[:, c] if w > 0]
                while stack:
                    w = stack.pop()
                    if not (self.flags[w]
                            & (F.IS_SOURCE_BOX | F.HAS_SOURCE_CHILD_BOXES)):
                        continue
                    if self.touch(w, b):
                        if self.flags[w] & F.HAS_SOURCE_CHILD_BOXES:
                            stack.extend(
                                x for x in self.child[:, w] if x > 0)
                    elif self.meets_smaller(b, w) and not self.forced(w):
                        far.add((b, w, self.levels[w]))
                    else:
                        if self.flags[w] & F.IS_SOURCE_BOX:
                            close.add((b, w))
                        if self.flags[w] & F.HAS_SOURCE_CHILD_BOXES:
                            stack.extend(
                                x for x in self.child[:, w] if x > 0)
        return far, close

    def list4(self, totp_boxes):
        far, close = set(), set()
        for b in totp_boxes:
            lb = self.levels[b]
            if lb == 0:
                continue
            par = self.parent[b]
            if self.n_away == 1:
                cur, wl = par, lb - 1
            else:
                cur, wl = b, lb
            while wl != 0:
                for s in self.slnws(cur):
                    if not (self.flags[s] & F.IS_SOURCE_BOX):
                        continue
                    if self.touch(s, b):
                        continue
                    if not self.meets_bigger(b, s):
                        if self.flags[b] & F.IS_TARGET_BOX:
                            close.add((b, s))
                        continue
                    would_be_parent = (not self.touch(s, par)) and wl < lb
                    if would_be_parent:
                        if not self.meets_bigger(par, s):
                            far.add((b, s))
                    else:
                        far.add((b, s))
                cur, wl = self.parent[cur], wl - 1
        return far, close


def _csr_pairs(row_boxes, starts, lists):
    starts = np.asarray(starts)
    lists = np.asarray(lists)
    out = set()
    for i, b in enumerate(np.asarray(row_boxes)):
        for x in lists[starts[i]:starts[i + 1]]:
            out.add((int(b), int(x)))
    return out


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    # This module compiles many one-off traversal variants; without
    # per-test cache drops the jax CPU compiler segfaults late in the
    # module (same issue the module-scoped conftest fixture works
    # around between modules).
    yield
    import gc
    import jax
    jax.clear_caches()
    gc.collect()


# The default run covers 10 of the 18 combos to keep suite compile
# counts (and the 1-CPU runtime) sane; the remaining 8 carry the
# ``nightly`` marker (deselected by default via addopts, run in the CI
# nightly job with ``-m nightly``) so the FULL 2x3x3 grid still runs.
_NIGHTLY = pytest.mark.nightly


@pytest.mark.parametrize("dims,crit,n_away,min_nsources", [
    (2, "static_linf", 1, 0),
    (2, "static_linf", 1, 30),
    (2, "static_linf", 2, 0),
    (2, "precise_linf", 1, 0),
    (2, "precise_linf", 1, 30),
    (2, "precise_linf", 2, 0),
    (2, "static_l2", 1, 0),
    pytest.param(2, "static_l2", 1, 30, marks=_NIGHTLY),
    pytest.param(2, "static_l2", 2, 0, marks=_NIGHTLY),
    pytest.param(3, "static_linf", 1, 0, marks=_NIGHTLY),
    (3, "static_linf", 1, 30),
    pytest.param(3, "static_linf", 2, 0, marks=_NIGHTLY),
    pytest.param(3, "precise_linf", 1, 0, marks=pytest.mark.smoke),
    pytest.param(3, "precise_linf", 1, 30, marks=_NIGHTLY),
    pytest.param(3, "precise_linf", 2, 0, marks=_NIGHTLY),
    pytest.param(3, "static_l2", 1, 0, marks=_NIGHTLY),
    pytest.param(3, "static_l2", 1, 30, marks=_NIGHTLY),
    (3, "static_l2", 2, 0),
])
def test_close_lists_vs_host_walk(dims, crit, n_away, min_nsources):
    tree = _make_extent_tree(dims, nsources=900, ntargets=800)
    trav = build_traversal(
        tree, well_sep_is_n_away=n_away, from_sep_smaller_crit=crit,
        _from_sep_smaller_min_nsources_cumul=min_nsources)
    oracle = _HostOracle(tree, n_away, crit, min_nsources)

    tb = np.asarray(trav.target_boxes)
    far3, close3 = oracle.list3(tb)

    got_far3 = set()
    for lev, ssn in enumerate(trav.from_sep_smaller_by_level):
        tsep = np.asarray(
            trav.target_boxes_sep_smaller_by_source_level[lev])
        for (b, w) in _csr_pairs(tsep, ssn.starts, ssn.lists):
            got_far3.add((b, w, lev))
    assert got_far3 == far3

    got_close3 = _csr_pairs(tb, trav.from_sep_close_smaller_starts,
                            trav.from_sep_close_smaller_lists)
    assert got_close3 == close3

    totp = np.asarray(trav.target_or_target_parent_boxes)
    far4, close4 = oracle.list4(totp)
    got_far4 = _csr_pairs(totp, trav.from_sep_bigger_starts,
                          trav.from_sep_bigger_lists)
    assert got_far4 == far4
    got_close4 = _csr_pairs(tb, trav.from_sep_close_bigger_starts,
                            trav.from_sep_close_bigger_lists)
    assert got_close4 == close4


@pytest.mark.parametrize("dims,n_away", [(2, 1), (2, 2), (3, 1)])
def test_extent_fmm_completeness(dims, n_away):
    """Counting-FMM exactness with target extents
    (mirrors ``test/test_fmm.py:141-392``, extent rows)."""
    nsources = 1500
    tree = _make_extent_tree(dims, seed=3, nsources=nsources,
                             ntargets=1200)
    trav = build_traversal(tree, well_sep_is_n_away=n_away)
    w = ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav)
    pot = np.asarray(drive_fmm(w, [np.ones(nsources)]))
    assert (pot == nsources).all()

    merged = trav.merge_close_lists()
    assert merged.from_sep_close_smaller_starts is None
    w2 = ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), merged)
    pot2 = np.asarray(drive_fmm(w2, [np.ones(nsources)]))
    assert (pot2 == nsources).all()

    # merged List 1 == union of the three close/neighbor lists, row by row
    tb = np.asarray(trav.target_boxes)
    union = (_csr_pairs(tb, trav.neighbor_source_boxes_starts,
                        trav.neighbor_source_boxes_lists)
             | _csr_pairs(tb, trav.from_sep_close_smaller_starts,
                          trav.from_sep_close_smaller_lists)
             | _csr_pairs(tb, trav.from_sep_close_bigger_starts,
                          trav.from_sep_close_bigger_lists))
    got = _csr_pairs(tb, merged.neighbor_source_boxes_starts,
                     merged.neighbor_source_boxes_lists)
    assert got == union


@pytest.mark.parametrize("extent_norm", ["linf", "l2"])
def test_extent_fmm_min_nsources(extent_norm):
    """min-nsources close-list forcing keeps exactness
    (mirrors ``test/test_fmm.py:617-666``)."""
    nsources = 1500
    tree = _make_extent_tree(2, seed=5, nsources=nsources, ntargets=1200,
                             extent_norm=extent_norm)
    trav = build_traversal(tree,
                           _from_sep_smaller_min_nsources_cumul=30)
    w = ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), trav)
    pot = np.asarray(drive_fmm(w, [np.ones(nsources)]))
    assert (pot == nsources).all()


def test_static_linf_rejected_for_l2_norm():
    tree = _make_extent_tree(2, extent_norm="l2", nsources=200,
                             ntargets=200)
    with pytest.raises(ValueError):
        build_traversal(tree, from_sep_smaller_crit="static_linf")
