"""Filtering the per-box target lists by a flag array.

Counterpart of ``boxtree/tree.py:955-1239``: given one flag per (user
order) target, produce per-box lists of the flagged targets, either

- in *user order* (:class:`FilteredTargetListsInUserOrder`): a CSR of
  user target indices per box, or
- in *tree order* (:class:`FilteredTargetListsInTreeOrder`): compact
  renumbered target coordinates with new per-box starts/counts and a
  filtered->unfiltered index map.

Because tree target order is grouped by owning box, both reduce to one
mask compaction plus a per-box ``segment_sum`` (the reference uses a
scan + index kernel pair, ``tree_build_kernels.py:1954-2021``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxtree_tpu.tree.containers import tree_dataclass


@tree_dataclass(meta=())
class FilteredTargetListsInUserOrder:
    """Mirrors ``boxtree/tree.py:957-998``.

    .. attribute:: target_starts

        ``particle_id_t [nboxes+1]``

    .. attribute:: target_lists

        user-order target indices, per box.
    """

    target_starts: object
    target_lists: object


@tree_dataclass(meta=())
class FilteredTargetListsInTreeOrder:
    """Mirrors ``boxtree/tree.py:1000-1055``."""

    nfiltered_targets: object
    box_target_starts: object
    box_target_counts_nonchild: object
    targets: object
    unfiltered_from_filtered_target_indexes: object


class ParticleListFilter:
    """Mirrors ``boxtree/tree.py:1057-1239``."""

    def __init__(self, actx=None):
        pass

    @staticmethod
    def _tree_order_flags(tree, flags):
        flags = jnp.asarray(flags)
        # user id of each tree-order target
        utid = jnp.zeros(tree.ntargets, jnp.int64).at[
            tree.sorted_target_ids.astype(jnp.int64)].set(
            jnp.arange(tree.ntargets, dtype=jnp.int64))
        return (flags[utid] != 0), utid

    def filter_target_lists_in_user_order(self, tree_or_actx, tree=None,
                                          flags=None):
        if flags is None:
            tree, flags = tree_or_actx, tree
        flag_t, utid = self._tree_order_flags(tree, flags)

        counts = jnp.zeros(tree.nboxes, jnp.int64).at[
            tree.box_id_of_target].add(flag_t.astype(jnp.int64))
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int64), jnp.cumsum(counts)])

        # rows must be concatenated in box-id order, but tree target
        # order is grouped by boxes in Morton (not id) order: key-sort
        total = int(flag_t.sum())
        keys = ((tree.box_id_of_target.astype(jnp.int64) << 32)
                | utid)
        keys = jnp.where(flag_t, keys, np.iinfo(np.int64).max)
        keys = jax.lax.sort(keys)[:total]
        return FilteredTargetListsInUserOrder(
            target_starts=starts.astype(jnp.int32),
            target_lists=(keys & 0xFFFFFFFF).astype(jnp.int32))

    def filter_target_lists_in_tree_order(self, tree_or_actx, tree=None,
                                          flags=None):
        if flags is None:
            tree, flags = tree_or_actx, tree
        flag_t, _utid = self._tree_order_flags(tree, flags)

        counts = jnp.zeros(tree.nboxes, jnp.int64).at[
            tree.box_id_of_target].add(flag_t.astype(jnp.int64))
        # start of each box's filtered range = number of flagged targets
        # before the box's (unfiltered) range start
        cumflag = jnp.concatenate(
            [jnp.zeros(1, jnp.int64),
             jnp.cumsum(flag_t.astype(jnp.int64))])
        starts = cumflag[tree.box_target_starts.astype(jnp.int64)]

        total = int(flag_t.sum())
        pos = jnp.cumsum(flag_t.astype(jnp.int64)) - 1
        unfiltered = jnp.zeros(total, jnp.int64).at[
            jnp.where(flag_t, pos, total)].set(
            jnp.arange(tree.ntargets, dtype=jnp.int64), mode="drop")

        return FilteredTargetListsInTreeOrder(
            nfiltered_targets=total,
            box_target_starts=starts.astype(jnp.int32),
            box_target_counts_nonchild=counts.astype(jnp.int32),
            targets=tree.targets[:, unfiltered],
            unfiltered_from_filtered_target_indexes=unfiltered.astype(
                jnp.int32))
