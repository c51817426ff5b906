"""Tree partitioning and responsibility masks for the distributed FMM.

Mirrors ``boxtree/distributed/partition.py``:

- :func:`dfs_box_order` (``partition.py:38-57``): Morton depth-first
  ordering of boxes.
- :func:`partition_work` (``partition.py:60-121``): contiguous DFS
  segments balanced by per-box cost, one per rank.
- :func:`get_box_masks` (``partition.py:174-357``): per-rank
  responsible / ancestor / point-source / multipole-source box masks.
  Point sources feed the rank's List 1 + List 4 (direct) interactions of
  responsible-or-ancestor boxes; multipole sources feed its List 2 of
  responsible-or-ancestor boxes and List 3 of responsible boxes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def dfs_box_order(tree):
    """Box ids in Morton depth-first order (``partition.py:38-57``)."""
    children = np.asarray(tree.box_child_ids)
    nboxes = tree.nboxes
    order = np.empty(nboxes, np.int64)
    stack = [0]
    pos = 0
    while stack:
        b = stack.pop()
        order[pos] = b
        pos += 1
        for c in children[::-1, b]:
            if c:
                stack.append(int(c))
    assert pos == nboxes
    return order


def partition_work(cost_per_box, traversal, nranks):
    """Split the DFS box order into *nranks* contiguous, cost-balanced
    segments; returns (nranks, nboxes) bool responsibility masks
    (``partition.py:60-121``)."""
    tree = traversal.tree
    cost = np.asarray(cost_per_box, np.float64)
    order = dfs_box_order(tree)
    cum = np.cumsum(cost[order])
    total = cum[-1]
    bounds = np.searchsorted(cum, total * np.arange(1, nranks) / nranks)

    masks = np.zeros((nranks, tree.nboxes), bool)
    seg_bounds = np.concatenate([[0], bounds + 1, [tree.nboxes]])
    seg_bounds = np.clip(seg_bounds, 0, tree.nboxes)
    for r in range(nranks):
        masks[r, order[seg_bounds[r]:seg_bounds[r + 1]]] = True
    return masks


@dataclass
class RankPartition:
    """Vectorized form of the DFS cost partition: instead of per-rank
    dense masks, every box carries its owner rank and the contiguous
    rank interval for which it is responsible-OR-ancestor.  This is what
    lets the distributed setup run as single sorts over ALL edges
    (O(E log E)) rather than per-rank passes (O(nranks * E)) — the DFS
    contiguity the reference's partition also guarantees
    (``boxtree/distributed/partition.py:60-121``) is what makes the
    intervals contiguous: box b is responsible-or-ancestor for rank r
    iff b's DFS subtree interval overlaps r's segment.
    """

    nranks: int
    #: (nboxes,) DFS position of each box
    pos_of_box: np.ndarray
    #: (nboxes,) DFS subtree size (descendants incl. self)
    subtree_size: np.ndarray
    #: (nranks + 1,) segment bounds in DFS positions
    seg_bounds: np.ndarray
    #: (nboxes,) responsible rank of each box
    owner_of_box: np.ndarray
    #: (nboxes,) first / last rank having the box responsible-or-ancestor
    r_lo: np.ndarray
    r_hi: np.ndarray

    def responsible_masks(self):
        """(nranks, nboxes) bool — compat with :func:`partition_work`."""
        return (self.owner_of_box[None, :]
                == np.arange(self.nranks)[:, None])

    def resp_or_anc_masks(self):
        """(nranks, nboxes) bool responsible-or-ancestor masks."""
        r = np.arange(self.nranks)[:, None]
        return (self.r_lo[None, :] <= r) & (r <= self.r_hi[None, :])


def partition_ranks(cost_per_box, traversal, nranks):
    """Cost-balanced DFS partition in vectorized (interval) form; the
    segment bounds match :func:`partition_work` exactly."""
    tree = traversal.tree
    cost = np.asarray(cost_per_box, np.float64)
    order = dfs_box_order(tree)
    nboxes = tree.nboxes
    pos_of_box = np.empty(nboxes, np.int64)
    pos_of_box[order] = np.arange(nboxes)

    cum = np.cumsum(cost[order])
    bounds = np.searchsorted(cum, cum[-1] * np.arange(1, nranks) / nranks)
    seg_bounds = np.clip(np.concatenate([[0], bounds + 1, [nboxes]]),
                         0, nboxes)

    # subtree sizes bottom-up (levels are shallow; each pass is O(nboxes))
    levels = np.asarray(tree.box_levels)
    parents = np.asarray(tree.box_parent_ids)
    size = np.ones(nboxes, np.int64)
    for lev in range(tree.nlevels - 1, 0, -1):
        sel = np.nonzero(levels == lev)[0]
        np.add.at(size, parents[sel], size[sel])

    owner = np.searchsorted(seg_bounds, pos_of_box, side="right") - 1
    owner = np.clip(owner, 0, nranks - 1)
    # subtree interval [pos_of_box[b], pos_of_box[b] + size[b]) against
    # the segments: overlapping ranks form the contiguous interval
    # [rank of first position, rank of last position]
    r_lo = np.searchsorted(seg_bounds, pos_of_box, side="right") - 1
    r_hi = np.searchsorted(seg_bounds, pos_of_box + size - 1,
                           side="right") - 1
    r_lo = np.clip(r_lo, 0, nranks - 1)
    r_hi = np.clip(r_hi, 0, nranks - 1)
    return RankPartition(nranks=nranks, pos_of_box=pos_of_box,
                         subtree_size=size, seg_bounds=seg_bounds,
                         owner_of_box=owner, r_lo=r_lo, r_hi=r_hi)


def _propagate_to_ancestors(tree, mask):
    """Mask of all (strict or non-strict) ancestors of masked boxes."""
    parents = np.asarray(tree.box_parent_ids)
    anc = np.zeros_like(mask)
    cur = mask.copy()
    for _ in range(tree.nlevels):
        nxt = np.zeros_like(mask)
        nxt[parents[np.nonzero(cur)[0]]] = True
        nxt &= ~anc
        if not nxt.any():
            break
        anc |= nxt
        cur = nxt
    anc[0] = True
    return anc


def _interaction_mask(traversal, row_boxes_mask, starts_name, lists_name,
                      rows_attr):
    """Boxes appearing in the given CSR list for rows whose box is in
    *row_boxes_mask*."""
    tree = traversal.tree
    starts = np.asarray(getattr(traversal, starts_name))
    lists = np.asarray(getattr(traversal, lists_name))
    rows = np.asarray(getattr(traversal, rows_attr))
    out = np.zeros(tree.nboxes, bool)
    counts = np.diff(starts)
    row_of_edge = np.repeat(np.arange(len(counts)), counts)
    sel = row_boxes_mask[rows[row_of_edge]]
    out[lists[sel]] = True
    return out


@dataclass
class BoxMasks:
    """Mirrors ``boxtree/distributed/partition.py:165-205``."""

    responsible_boxes: np.ndarray
    ancestor_boxes: np.ndarray
    point_src_boxes: np.ndarray
    multipole_src_boxes: np.ndarray


def get_box_masks(traversal, responsible_mask):
    """Per-rank box masks (``partition.py:174-357``)."""
    tree = traversal.tree
    resp = np.asarray(responsible_mask, bool)
    anc = _propagate_to_ancestors(tree, resp)
    resp_or_anc = resp | anc

    point_src = (_interaction_mask(
        traversal, resp_or_anc, "neighbor_source_boxes_starts",
        "neighbor_source_boxes_lists", "target_boxes")
        | _interaction_mask(
            traversal, resp_or_anc, "from_sep_bigger_starts",
            "from_sep_bigger_lists", "target_or_target_parent_boxes"))

    mp_src = _interaction_mask(
        traversal, resp_or_anc, "from_sep_siblings_starts",
        "from_sep_siblings_lists", "target_or_target_parent_boxes")
    for lvl, ssn in enumerate(traversal.from_sep_smaller_by_level):
        if ssn.count == 0:
            continue
        starts = np.asarray(ssn.starts)
        lists = np.asarray(ssn.lists)
        tb = np.asarray(
            traversal.target_boxes_sep_smaller_by_source_level[lvl])
        counts = np.diff(starts)
        row_of_edge = np.repeat(np.arange(len(counts)), counts)
        sel = resp[tb[row_of_edge]]
        mp_src[lists[sel]] = True

    return BoxMasks(responsible_boxes=resp, ancestor_boxes=anc,
                    point_src_boxes=point_src,
                    multipole_src_boxes=mp_src)
