"""Constant-one ("counting") expansion wrangler.

A wrangler for the Green's function that is identically 1: for unit source
weights every target's potential must equal ``nsources`` exactly.  The
reference uses this to verify interaction-list completeness
(``boxtree/constant_one.py:50-237``); here it doubles as the oracle for
the traversal builder.

Unlike the reference's per-box Python loops, every stage is vectorized
with gathers / ``segment_sum`` over the CSR edge lists, so the whole FMM
is jittable end-to-end.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from boxtree_tpu.fmm.drive import (
    ExpansionWranglerInterface,
    TreeIndependentDataForWrangler,
)


def csr_edge_rows(starts, nedges):
    """Row index of every edge in a CSR list."""
    return (jnp.searchsorted(
        starts.astype(jnp.int64),
        jnp.arange(nedges, dtype=jnp.int64), side="right") - 1)


def segment_sum(vals, ids, num_segments):
    return jnp.zeros(num_segments, vals.dtype).at[ids].add(vals)


class ConstantOneTreeIndependentDataForWrangler(
        TreeIndependentDataForWrangler):
    pass


class ConstantOneExpansionWrangler(ExpansionWranglerInterface):
    """Mirrors ``boxtree/constant_one.py:50-237``, vectorized."""

    def __init__(self, tree_indep, traversal, dtype=jnp.float64):
        super().__init__(tree_indep, traversal)
        self.dtype = dtype
        tree = traversal.tree

        # owning box of every output slot and an optional output mask;
        # the filtered-target subclasses below override these
        self._out_box_map = tree.box_id_of_target
        self._out_mask = None

        # host-side level boundaries for the sequential up/down passes
        self._lsb = tree.level_start_box_nrs
        self._ls_totp = np.asarray(
            traversal.level_start_target_or_target_parent_box_nrs)

        # dense box-id -> row-in-target_boxes map
        nboxes = tree.nboxes
        row = jnp.full(nboxes + 1, -1, jnp.int32)
        self._tgt_row_of_box = row.at[traversal.target_boxes].set(
            jnp.arange(traversal.ntarget_boxes, dtype=jnp.int32))[:nboxes]

    # {{{ zeros

    def multipole_expansion_zeros(self):
        return jnp.zeros(self.tree.nboxes, dtype=self.dtype)

    local_expansion_zeros = multipole_expansion_zeros

    def output_zeros(self):
        return jnp.zeros(self._out_box_map.shape[0], dtype=self.dtype)

    def _to_outputs(self, per_box_vals):
        """Distribute per-box values to the output slots."""
        vals = per_box_vals[self._out_box_map]
        if self._out_mask is not None:
            vals = jnp.where(self._out_mask, vals, 0)
        return vals

    # }}}

    def reorder_sources(self, source_array):
        return jnp.asarray(source_array)[self.tree.user_source_ids]

    def reorder_potentials(self, potentials):
        return potentials[self.tree.sorted_target_ids]

    def multipole_expansions_view(self, mpole_exps, level):
        return mpole_exps[self._lsb[level]:self._lsb[level + 1]]

    local_expansions_view = multipole_expansions_view

    def _box_source_sums(self, src_weights):
        """Sum of weights over each box's nonchild sources."""
        return segment_sum(src_weights, self.tree.box_id_of_source,
                           self.tree.nboxes)

    def form_multipoles(self, level_start_source_box_nrs, source_boxes,
                        src_weight_vecs):
        src_weights, = src_weight_vecs
        return self._box_source_sums(src_weights)

    def coarsen_multipoles(self, level_start_source_parent_box_nrs,
                           source_parent_boxes, mpoles):
        tree = self.tree
        parents = tree.box_parent_ids
        # source_level from nlevels-1 down to 3 (boxtree/constant_one.py:113)
        for source_level in range(tree.nlevels - 1, 2, -1):
            b0, b1 = self._lsb[source_level], self._lsb[source_level + 1]
            ids = jnp.arange(b0, b1)
            mpoles = mpoles.at[parents[ids]].add(mpoles[ids])
        return mpoles

    def eval_direct(self, target_boxes, neighbor_sources_starts,
                    neighbor_sources_lists, src_weight_vecs):
        src_weights, = src_weight_vecs
        box_sums = self._box_source_sums(src_weights)
        nedges = neighbor_sources_lists.shape[0]
        rows = csr_edge_rows(neighbor_sources_starts, nedges)
        row_sums = segment_sum(box_sums[neighbor_sources_lists], rows,
                               target_boxes.shape[0])
        # distribute to each output slot via its owning box's row
        pot_box = jnp.zeros(self.tree.nboxes, self.dtype).at[
            target_boxes].set(row_sums)
        return self._to_outputs(pot_box)

    def multipole_to_local(self, level_start_target_or_target_parent_box_nrs,
                           target_or_target_parent_boxes, starts, lists,
                           mpole_exps):
        nedges = lists.shape[0]
        rows = csr_edge_rows(starts, nedges)
        contrib = segment_sum(mpole_exps[lists], rows,
                              target_or_target_parent_boxes.shape[0])
        local_exps = self.local_expansion_zeros()
        return local_exps.at[target_or_target_parent_boxes].add(contrib)

    def eval_multipoles(self, target_boxes_by_source_level,
                        from_sep_smaller_by_level, mpole_exps):
        pot_box = jnp.zeros(self.tree.nboxes, self.dtype)
        for level, ssn in enumerate(from_sep_smaller_by_level):
            if ssn.count == 0:
                continue
            rows = csr_edge_rows(ssn.starts, ssn.lists.shape[0])
            tb = target_boxes_by_source_level[level]
            contrib = segment_sum(mpole_exps[ssn.lists], rows, tb.shape[0])
            pot_box = pot_box.at[tb].add(contrib)
        return self._to_outputs(pot_box)

    def form_locals(self, level_start_target_or_target_parent_box_nrs,
                    target_or_target_parent_boxes, starts, lists,
                    src_weight_vecs):
        src_weights, = src_weight_vecs
        box_sums = self._box_source_sums(src_weights)
        rows = csr_edge_rows(starts, lists.shape[0])
        contrib = segment_sum(box_sums[lists], rows,
                              target_or_target_parent_boxes.shape[0])
        local_exps = self.local_expansion_zeros()
        return local_exps.at[target_or_target_parent_boxes].add(contrib)

    def refine_locals(self, level_start_target_or_target_parent_box_nrs,
                      target_or_target_parent_boxes, local_exps):
        parents = self.tree.box_parent_ids
        for target_lev in range(1, self.tree.nlevels):
            r0, r1 = self._ls_totp[target_lev], self._ls_totp[target_lev + 1]
            ids = target_or_target_parent_boxes[r0:r1]
            local_exps = local_exps.at[ids].add(local_exps[parents[ids]])
        return local_exps

    def eval_locals(self, level_start_target_box_nrs, target_boxes,
                    local_exps):
        return self._to_outputs(local_exps)

    def finalize_potentials(self, potentials):
        return potentials

    # {{{ edge-based protocol (used by the distributed runner)

    #: no per-operator grouping needed for the counting kernel
    m2l_plan = None

    def potential_box_map(self):
        """Box id owning each output-potential slot."""
        return self._out_box_map

    def _edge_scatter(self, tgt_e, src_e, valid_e, per_src_box):
        valid = (tgt_e >= 0) & (src_e >= 0)
        if valid_e is not None:
            valid = valid & valid_e
        vals = jnp.where(valid, per_src_box[jnp.clip(src_e, 0)], 0)
        nboxes = self.tree.nboxes
        safe = jnp.where(valid, tgt_e, nboxes)
        return jnp.zeros(nboxes, self.dtype).at[safe].add(
            vals, mode="drop")

    def eval_direct_edges(self, tgt_e, src_e, valid_e, src_weights):
        box_sums = self._box_source_sums(src_weights)
        return self._to_outputs(
            self._edge_scatter(tgt_e, src_e, valid_e, box_sums))

    def eval_multipoles_edges(self, tgt_e, src_e, valid_e, mpole_exps):
        return self._to_outputs(
            self._edge_scatter(tgt_e, src_e, valid_e, mpole_exps))

    def form_locals_edges(self, tgt_e, src_e, valid_e, src_weights):
        box_sums = self._box_source_sums(src_weights)
        return self._edge_scatter(tgt_e, src_e, valid_e, box_sums)

    def multipole_to_local_edges(self, tgt_e, src_e, group_sizes,
                                 mpole_exps):
        return self._edge_scatter(tgt_e, src_e, None, mpole_exps)

    def coarsen_multipoles_rows_grouped(self, rows, digit_sizes,
                                        level_slices, mpoles):
        """Upward pass over an explicit level-sorted padded row set
        (per-rank owned + ancestor boxes; *digit_sizes* unused — the
        counting "operator" is digit-independent).  *level_slices*
        descend."""
        tree = self.tree
        parents = tree.box_parent_ids
        for _lev, s0, s1 in level_slices:
            ids = rows[s0:s1]
            contrib = mpoles[jnp.clip(ids, 0)]
            mpoles = mpoles.at[
                jnp.where(ids >= 0,
                          parents[jnp.clip(ids, 0)].astype(jnp.int64),
                          tree.nboxes)].add(
                    jnp.where(ids >= 0, contrib, 0), mode="drop")
        return mpoles

    def refine_locals_rows_grouped(self, rows, digit_sizes, level_slices,
                                   local_exps):
        """Downward pass over an explicit level-sorted padded row set
        (the distributed per-rank responsible+ancestor chain): each
        level block adds the parent's count in one gather+scatter.
        *digit_sizes* is unused (the counting "operator" is digit-
        independent)."""
        tree = self.tree
        parents = tree.box_parent_ids
        for _lev, s0, s1 in level_slices:
            ids = rows[s0:s1]
            contrib = local_exps[parents[jnp.clip(ids, 0)]]
            local_exps = local_exps.at[
                jnp.where(ids >= 0, ids, tree.nboxes)].add(
                    contrib, mode="drop")
        return local_exps

    # }}}


class ConstantOneExpansionWranglerWithFilteredTargetsInTreeOrder(
        ConstantOneExpansionWrangler):
    """Evaluate only the targets kept by a
    :class:`~boxtree_tpu.tree.filtering.FilteredTargetListsInTreeOrder`
    (mirrors the reference test wrangler, ``test/test_fmm.py:103-124``):
    outputs are sized ``nfiltered_targets``; ``reorder_potentials``
    scatters them back into user target order (zeros elsewhere)."""

    def __init__(self, tree_indep, traversal, filtered_targets):
        super().__init__(tree_indep, traversal)
        self.filtered_targets = filtered_targets
        unf = filtered_targets.unfiltered_from_filtered_target_indexes
        self._unfiltered = unf.astype(jnp.int64)
        self._out_box_map = traversal.tree.box_id_of_target[
            self._unfiltered]

    def reorder_potentials(self, potentials):
        tree_order = jnp.zeros(self.tree.ntargets, potentials.dtype).at[
            self._unfiltered].set(potentials)
        return tree_order[self.tree.sorted_target_ids]


class ConstantOneExpansionWranglerWithFilteredTargetsInUserOrder(
        ConstantOneExpansionWrangler):
    """Evaluate only the targets kept by a
    :class:`~boxtree_tpu.tree.filtering.FilteredTargetListsInUserOrder`
    (mirrors ``test/test_fmm.py:127-140``): outputs stay sized
    ``ntargets`` in tree order, zero at filtered-out targets."""

    def __init__(self, tree_indep, traversal, filtered_targets):
        super().__init__(tree_indep, traversal)
        self.filtered_targets = filtered_targets
        tree = traversal.tree
        # tree-order membership mask from the per-box user-id CSR
        member_user = np.zeros(tree.ntargets, bool)
        member_user[np.asarray(filtered_targets.target_lists)] = True
        tree_pos = np.asarray(tree.sorted_target_ids)  # user -> tree pos
        member_tree = np.zeros(tree.ntargets, bool)
        member_tree[tree_pos[member_user]] = True
        self._out_mask = jnp.asarray(member_tree)
