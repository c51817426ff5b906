"""Geometric lookup structures: area queries, leaves-to-balls lookup,
space-invader queries, peer lists.

Counterparts of ``boxtree/area_query.py``:

- :class:`AreaQueryBuilder` (``area_query.py:657-807``): for each ball
  (l-inf ball of given center/radius), the leaf boxes it overlaps.
  Implemented as a level-synchronized frontier sweep: starting from
  ``(ball, root)``, each level expands every frontier pair to the
  overlapping children (a fixed 2^d fan-out — branch-free and batched,
  in place of the reference's per-ball guiding-box + stack walk),
  emitting leaves as they are reached.  One count/compact round per
  level.
- :class:`LeavesToBallsLookupBuilder` (``area_query.py:814-918``): the
  inverse map, built from the same (ball, leaf) edges by one key sort.
- :class:`SpaceInvaderQueryBuilder` (``area_query.py:925-1049``): for
  each leaf, the farthest l-inf center distance among overlapping balls
  (the reference uses an int-compare atomic-max; here a scatter-max).
- :class:`PeerListFinder` (``area_query.py:1057-1188``): for each box,
  the adjacent boxes at the same level plus coarser adjacent boxes that
  are leaves or have no adjacent children ("frontier" peers).

The overlap predicate matches the reference's
``check_l_infty_ball_overlap`` (``boxtree/traversal.py:200-214``):
``linf(ball_center - box_center) <= box_radius + ball_radius``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from boxtree_tpu.ops import morton
from boxtree_tpu.tree.containers import tree_dataclass
from boxtree_tpu.traversal.build import (
    _count_rowlist,
    _exclusive_cumsum,
    _fill_rowlist,
    _lookup,
    _mask_to_list,
    _offsets,
    _starts_of_rows,
    _touch,
)


# {{{ containers

@tree_dataclass(meta=())
class AreaQueryResult:
    """CSR of leaves overlapping each ball
    (mirrors ``boxtree/area_query.py:50-76``)."""

    tree: object
    leaves_near_ball_starts: object
    leaves_near_ball_lists: object


@tree_dataclass(meta=())
class LeavesToBallsLookup:
    """CSR of balls overlapping each box (empty for non-leaves);
    mirrors ``boxtree/area_query.py:79-105``."""

    tree: object
    balls_near_box_starts: object
    balls_near_box_lists: object


@tree_dataclass(meta=())
class PeerListLookup:
    """CSR of peers of each box (mirrors ``boxtree/area_query.py:108-130``)."""

    tree: object
    peer_list_starts: object
    peer_lists: object

# }}}


# {{{ ball <-> leaf edges via level-synchronized frontier sweep

@partial(jax.jit, static_argnames=("nkeep",))
def _expand_frontier(ball_idx, box_idx, centers, radii, box_child_ids,
                     box_centers, box_levels, box_flags, root_extent,
                     *, nkeep):
    """One level of the sweep: (F,) frontier pairs -> (F, 2^d) children
    with overlap/leaf classification."""
    nchild = box_child_ids.shape[0]
    children = box_child_ids[:, box_idx]               # (2^d, F)
    bc = centers[:, ball_idx]                          # (d, F)
    br = radii[ball_idx]                               # (F,)
    ccenters = box_centers[:, children]                # (d, 2^d, F)
    clevels = box_levels[children]
    crad = root_extent / (1 << (clevels + 1))
    dist = jnp.max(jnp.abs(ccenters - bc[:, None, :]), axis=0)
    overlap = (children > 0) & (dist <= crad + br[None, :])
    from boxtree_tpu.tree.containers import box_flags_enum
    is_leaf = (box_flags[children] & box_flags_enum.IS_LEAF_BOX) != 0
    hit = overlap & is_leaf
    descend = overlap & ~is_leaf
    return children, hit, descend


@partial(jax.jit, static_argnames=("n_hits", "n_next"))
def _compact_frontier(ball_idx, children, hit, descend, *, n_hits, n_next):
    nchild, f = children.shape
    balls = jnp.broadcast_to(ball_idx[None, :], (nchild, f)).reshape(-1)
    boxes = children.reshape(-1)
    hitf = hit.reshape(-1)
    desf = descend.reshape(-1)

    hit_keys = (balls.astype(jnp.int64) << np.int64(32)) \
        | boxes.astype(jnp.int64)
    pos_h = jnp.cumsum(hitf.astype(jnp.int64)) - 1
    hits = jnp.zeros(n_hits, jnp.int64).at[
        jnp.where(hitf, pos_h, n_hits)].set(hit_keys, mode="drop")

    pos_d = jnp.cumsum(desf.astype(jnp.int64)) - 1
    nb = jnp.zeros(n_next, jnp.int32).at[
        jnp.where(desf, pos_d, n_next)].set(balls.astype(jnp.int32),
                                            mode="drop")
    nx = jnp.zeros(n_next, jnp.int32).at[
        jnp.where(desf, pos_d, n_next)].set(boxes, mode="drop")
    return hits, nb, nx


def _ball_leaf_edges(tree, ball_centers, ball_radii):
    """Sorted (ball<<32 | leaf) keys of all overlapping (ball, leaf)
    pairs, including root-is-leaf trees."""
    centers = jnp.asarray(ball_centers)
    radii = jnp.asarray(ball_radii)
    nballs = centers.shape[1]

    from boxtree_tpu.tree.containers import box_flags_enum
    root_is_leaf = bool(np.asarray(tree.box_flags)[0]
                        & box_flags_enum.IS_LEAF_BOX)

    hit_chunks = []
    if root_is_leaf:
        # every ball overlapping the root (they all do if inside bbox;
        # test anyway)
        rad0 = float(np.asarray(tree.root_extent)) / 2
        dist = jnp.max(jnp.abs(centers - tree.box_centers[:, 0][:, None]),
                       axis=0)
        ov = dist <= rad0 + radii
        total = int(ov.sum())
        balls = _mask_to_list(ov, total=total)
        hit_chunks.append(balls.astype(jnp.int64) << np.int64(32))
        ball_idx = jnp.zeros(0, jnp.int32)
        box_idx = jnp.zeros(0, jnp.int32)
    else:
        ball_idx = jnp.arange(nballs, dtype=jnp.int32)
        box_idx = jnp.zeros(nballs, jnp.int32)

    while int(ball_idx.shape[0]):
        children, hit, descend = _expand_frontier(
            ball_idx, box_idx, centers, radii, tree.box_child_ids,
            tree.box_centers, tree.box_levels, tree.box_flags,
            tree.root_extent, nkeep=0)
        nh, nn = jax.device_get((hit.sum(), descend.sum()))
        hits, nb, nx = _compact_frontier(
            ball_idx, children, hit, descend,
            n_hits=int(nh), n_next=int(nn))
        hit_chunks.append(hits)
        ball_idx, box_idx = nb, nx

    if hit_chunks:
        all_keys = jax.lax.sort(jnp.concatenate(hit_chunks))
    else:
        all_keys = jnp.zeros(0, jnp.int64)
    return all_keys, nballs

# }}}


class AreaQueryBuilder:
    """For each ball, find the leaf boxes overlapping it.
    Mirrors ``boxtree/area_query.py:657-807``."""

    def __init__(self, actx=None):
        pass

    def __call__(self, tree_or_actx, tree=None, ball_centers=None,
                 ball_radii=None, peer_lists=None):
        if ball_radii is None:
            tree, ball_centers, ball_radii = (
                tree_or_actx, tree, ball_centers)
        keys, nballs = _ball_leaf_edges(tree, ball_centers, ball_radii)
        starts = _starts_of_rows(keys >> np.int64(32), nballs)
        lists = (keys & np.int64(0xFFFFFFFF)).astype(jnp.int32)
        return AreaQueryResult(
            tree=tree,
            leaves_near_ball_starts=starts,
            leaves_near_ball_lists=lists)


class LeavesToBallsLookupBuilder:
    """For each box, find the balls overlapping it (nonempty only for
    leaves).  Mirrors ``boxtree/area_query.py:814-918`` (which inverts an
    area query with a key-value sort, as done here)."""

    def __init__(self, actx=None):
        pass

    def __call__(self, tree_or_actx, tree=None, ball_centers=None,
                 ball_radii=None, peer_lists=None):
        if ball_radii is None:
            tree, ball_centers, ball_radii = (
                tree_or_actx, tree, ball_centers)
        keys, _nballs = _ball_leaf_edges(tree, ball_centers, ball_radii)
        # re-key by (leaf << 32 | ball) and sort
        balls = keys >> np.int64(32)
        leaves = keys & np.int64(0xFFFFFFFF)
        inv = jax.lax.sort((leaves << np.int64(32)) | balls)
        starts = _starts_of_rows(inv >> np.int64(32), tree.nboxes)
        lists = (inv & np.int64(0xFFFFFFFF)).astype(jnp.int32)
        return LeavesToBallsLookup(
            tree=tree,
            balls_near_box_starts=starts,
            balls_near_box_lists=lists)


def area_query_elementwise(tree, ball_center_and_radius, nballs,
                           leaf_found_op, out, combine="add"):
    """Reusable custom area query — the TPU-native analogue of the
    reference's ``AreaQueryElementwiseTemplate``
    (``boxtree/area_query.py:495-610``), which downstream users
    instantiate with a ball-generator macro and a per-leaf callback
    macro.

    :arg ball_center_and_radius: the ball generator: maps a ``(B,)``
        index vector to ``((d, B) centers, (B,) radii)`` (the
        reference's ``get_ball_center_and_radius`` macro, vectorized).
    :arg leaf_found_op: the per-hit callback: maps the ``(E,)`` edge
        vectors ``(ball_idx, leaf_box_id)`` to ``(values,
        out_indices)`` (the reference's ``leaf_found_op`` macro; its
        OpenCL instances write through atomics — here the writes
        combine by scatter-*combine*).
    :arg out: accumulator array; returned updated.
    :arg combine: ``"add"``, ``"max"``, or ``"min"``.

    Instead of the reference's per-workitem guiding-box stack walk, the
    balls run through the batched level-synchronized frontier sweep
    (:func:`_ball_leaf_edges`), then one vectorized callback + scatter.
    """
    idx = jnp.arange(nballs, dtype=jnp.int64)
    centers, radii = ball_center_and_radius(idx)
    keys, _ = _ball_leaf_edges(tree, centers, radii)
    balls = (keys >> np.int64(32)).astype(jnp.int64)
    leaves = (keys & np.int64(0xFFFFFFFF)).astype(jnp.int64)
    vals, oidx = leaf_found_op(balls, leaves)
    upd = getattr(out.at[oidx], combine)
    return upd(vals)


class SpaceInvaderQueryBuilder:
    """For each leaf box, the farthest l-inf distance from the box center
    to the center of any overlapping ball; 0 where none.
    Mirrors ``boxtree/area_query.py:925-1049`` — and, like the
    reference's ``SPACE_INVADER_QUERY_TEMPLATE``, is an instance of the
    elementwise area-query mechanism."""

    def __init__(self, actx=None):
        pass

    def __call__(self, tree_or_actx, tree=None, ball_centers=None,
                 ball_radii=None, peer_lists=None):
        if ball_radii is None:
            tree, ball_centers, ball_radii = (
                tree_or_actx, tree, ball_centers)
        centers = jnp.asarray(ball_centers)
        radii = jnp.asarray(ball_radii)

        def leaf_found_op(balls, leaves):
            dist = jnp.max(jnp.abs(centers[:, balls]
                                   - tree.box_centers[:, leaves]),
                           axis=0)
            return dist.astype(jnp.float32), leaves

        return area_query_elementwise(
            tree, lambda i: (centers, radii), centers.shape[1],
            leaf_found_op, jnp.zeros(tree.nboxes, jnp.float32),
            combine="max")

# }}}


# {{{ peer lists

def _gen_peers(rows_pfx, prefixes, box_flags, offs, *, level, dimensions,
               lsb, k_pad):
    """Peers of all boxes at (static) *level*: same-level adjacent boxes
    (incl. self) plus coarser adjacent boxes that are leaves or have no
    adjacent children (``boxtree/area_query.py:393-475``)."""
    from boxtree_tpu.tree.containers import box_flags_enum as F
    d = dimensions
    cells = morton.deinterleave(rows_pfx, d)
    rows = rows_pfx.shape[0]
    chunks = []
    for lp in range(level + 1):
        anc = cells >> np.int64(level - lp)
        cand = anc[:, :, None] + offs.T[:, None, :]
        found, box_id = _lookup(prefixes[lsb[lp]:lsb[lp + 1]], lsb[lp],
                                cand, lp)
        touch = _touch(cand, lp, cells[:, :, None], level)
        ok = found & touch
        if lp == level:
            valid = ok
        else:
            idc = jnp.where(found, box_id, 0)
            is_leaf = (box_flags[idc] & F.IS_LEAF_BOX) != 0
            # does any existing child of the candidate touch the row box?
            any_child_touch = jnp.zeros(ok.shape, bool)
            if lp + 1 <= level:
                for digit in range(2 ** d):
                    dig_bits = jnp.asarray(
                        [(digit >> (d - 1 - ax)) & 1 for ax in range(d)],
                        dtype=jnp.int64)
                    ccell = (cand << np.int64(1)) \
                        + dig_bits[:, None, None]
                    cfound, _cid = _lookup(
                        prefixes[lsb[lp + 1]:lsb[lp + 2]], lsb[lp + 1],
                        ccell, lp + 1)
                    ctouch = _touch(ccell, lp + 1, cells[:, :, None],
                                    level)
                    any_child_touch = any_child_touch | (cfound & ctouch)
            valid = ok & (is_leaf | ~any_child_touch)
        chunks.append(jnp.where(valid, box_id, -1))
    block = jnp.concatenate(chunks, axis=1)
    if block.shape[1] < k_pad:
        block = jnp.concatenate(
            [block, jnp.full((rows, k_pad - block.shape[1]), -1,
                             jnp.int32)], axis=1)
    return block


@partial(jax.jit, static_argnames=("dimensions", "lsb"))
def _peer_counts(prefixes, box_flags, *, dimensions, lsb):
    nlevels = len(lsb) - 1
    nboxes = lsb[-1]
    offs = jnp.asarray(_offsets(dimensions, 1))
    counts = jnp.zeros(nboxes + 1, jnp.int32)
    k_pad = offs.shape[0] * nlevels
    for lev in range(nlevels):
        pfx_l = prefixes[lsb[lev]:lsb[lev + 1]]
        gen = partial(_gen_peers, prefixes=prefixes, box_flags=box_flags,
                      offs=offs, level=lev, dimensions=dimensions,
                      lsb=lsb, k_pad=k_pad)
        counts = _count_rowlist(gen, pfx_l, lsb[lev], counts)
    return counts[:-1], counts[:-1].sum()


@partial(jax.jit, static_argnames=("dimensions", "lsb", "total"))
def _peer_fill(prefixes, box_flags, counts, *, dimensions, lsb, total):
    nlevels = len(lsb) - 1
    offs = jnp.asarray(_offsets(dimensions, 1))
    starts = _exclusive_cumsum(counts.astype(jnp.int64))
    out = jnp.zeros(total, jnp.int32)
    k_pad = offs.shape[0] * nlevels
    for lev in range(nlevels):
        pfx_l = prefixes[lsb[lev]:lsb[lev + 1]]
        gen = partial(_gen_peers, prefixes=prefixes, box_flags=box_flags,
                      offs=offs, level=lev, dimensions=dimensions,
                      lsb=lsb, k_pad=k_pad)
        out = _fill_rowlist(gen, pfx_l, lsb[lev], starts, out)
    return starts.astype(jnp.int32), out


class PeerListFinder:
    """Find each box's peers; mirrors ``boxtree/area_query.py:1057-1188``."""

    def __init__(self, actx=None):
        pass

    def __call__(self, tree_or_actx, tree=None):
        if tree is None:
            tree = tree_or_actx
        lsb = tree.level_start_box_nrs
        counts, total = _peer_counts(
            tree.box_morton_prefixes, tree.box_flags,
            dimensions=tree.dimensions, lsb=lsb)
        starts, lists = _peer_fill(
            tree.box_morton_prefixes, tree.box_flags, counts,
            dimensions=tree.dimensions, lsb=lsb, total=int(total))
        return PeerListLookup(tree=tree, peer_list_starts=starts,
                              peer_lists=lists)

# }}}
