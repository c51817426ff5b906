"""Linking point sources to extent-bearing sources.

Counterpart of ``boxtree/tree.py:693-949``: each original (extent-bearing)
source stands for a contiguous run of *point sources*; this module
produces the expanded tree in which the point sources are stored
contiguously per box (in tree source order), along with the per-box CSR
arrays an FMM needs to use them as the actual sources.

Everything reduces to prefix-sum gathers over the tree source order plus
one ``searchsorted``-based expansion (the reference uses two scan kernels
and an elementwise kernel, ``boxtree/tree_build_kernels.py:1872-1948``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxtree_tpu.tree.containers import tree_dataclass


@tree_dataclass(meta=("npoint_sources",))
class TreeWithLinkedPointSources:
    """Mirrors the fields of ``boxtree/tree.py:695-769``.

    .. attribute:: tree

        The original :class:`boxtree_tpu.Tree`.

    .. attribute:: npoint_sources

    .. attribute:: point_source_starts

        ``particle_id_t [nsources]`` — start of each (tree-order) source's
        point sources in :attr:`point_sources`.

    .. attribute:: point_source_counts

        ``particle_id_t [nsources]``

    .. attribute:: point_sources

        ``coord_t [dimensions, npoint_sources]`` in tree point-source
        order (contiguous per box).

    .. attribute:: user_point_source_ids

        Gather *from* these indices to reorder user-order point-source
        data into tree point-source order.

    .. attribute:: box_point_source_starts
    .. attribute:: box_point_source_counts_nonchild
    .. attribute:: box_point_source_counts_cumul
    """

    tree: object
    npoint_sources: int
    point_source_starts: object
    point_source_counts: object
    point_sources: object
    user_point_source_ids: object
    box_point_source_starts: object
    box_point_source_counts_nonchild: object
    box_point_source_counts_cumul: object


def link_point_sources(tree, point_source_starts, point_sources,
                       debug=False):
    """Mirrors ``boxtree/tree.py:772-949``.

    :arg point_source_starts: ``[nsources+1]`` CSR starts (user source
        order): user source *i*'s point sources are
        ``point_sources[:, point_source_starts[i]:point_source_starts[i+1]]``.
    :arg point_sources: ``(dimensions, npoint_sources)`` coordinates
        (user point-source order).
    """
    user_starts = jnp.asarray(point_source_starts).astype(jnp.int64)
    point_sources = jnp.asarray(point_sources)
    npoint = int(user_starts[-1])

    usid = tree.user_source_ids.astype(jnp.int64)
    counts_tree = (user_starts[usid + 1] - user_starts[usid])
    pss = jnp.concatenate(
        [jnp.zeros(1, jnp.int64), jnp.cumsum(counts_tree)])

    # expansion: for output slot k, owning tree source + offset
    k = jnp.arange(npoint, dtype=jnp.int64)
    src_of_k = jnp.searchsorted(pss, k, side="right") - 1
    off = k - pss[src_of_k]
    user_point_source_ids = (user_starts[usid[src_of_k]] + off).astype(
        jnp.int32)

    pid = np.int32
    starts64 = tree.box_source_starts.astype(jnp.int64)
    nonchild = tree.box_source_counts_nonchild.astype(jnp.int64)
    cumul = tree.box_source_counts_cumul.astype(jnp.int64)

    box_ps_starts = pss[starts64]
    box_ps_cumul = pss[starts64 + cumul] - box_ps_starts
    box_ps_nonchild = pss[starts64 + nonchild] - box_ps_starts

    return TreeWithLinkedPointSources(
        tree=tree,
        npoint_sources=npoint,
        point_source_starts=pss[:-1].astype(pid),
        point_source_counts=counts_tree.astype(pid),
        point_sources=point_sources[:, user_point_source_ids],
        user_point_source_ids=user_point_source_ids,
        box_point_source_starts=box_ps_starts.astype(pid),
        box_point_source_counts_nonchild=box_ps_nonchild.astype(pid),
        box_point_source_counts_cumul=box_ps_cumul.astype(pid),
    )
