"""Dense per-box particle blocks and CSR edge helpers for FMM wranglers.

Expansion wranglers need three dense views of the (ragged) per-box
particle lists:

- ``ParticleBlocks``: every box's nonchild particles padded to a common
  width ``pmax`` (bounded by the tree's ``max_leaf_refine_weight``), so
  P2P/M2P/P2L become batched fixed-shape kernels — MXU/VPU-friendly
  instead of the reference's per-box variable-length Fortran calls
  (``boxtree/pyfmmlib_integration.py:677-1144``).
- CSR edge row indices (one row id per interaction-list entry).
- a per-level execution plan for M2L batched by translation class.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("nboxes", "pmax"))
def _build_blocks(coords, box_of_particle, box_starts, *, nboxes, pmax):
    n = coords.shape[1]
    d = coords.shape[0]
    off = jnp.arange(n, dtype=jnp.int64) \
        - box_starts.astype(jnp.int64)[box_of_particle]
    # particles beyond their box's nonchild range can't occur: nonchild
    # ranges tile the particle array exactly.
    pts = jnp.zeros((nboxes, pmax, d), coords.dtype)
    pts = pts.at[box_of_particle, off].set(coords.T, mode="drop")
    mask = jnp.zeros((nboxes, pmax), bool)
    mask = mask.at[box_of_particle, off].set(True, mode="drop")
    idx = jnp.zeros((nboxes, pmax), jnp.int32)
    idx = idx.at[box_of_particle, off].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return pts, mask, idx


class ParticleBlocks:
    """Padded (nboxes, pmax, dim) view of each box's nonchild particles.

    .. attribute:: points  (nboxes, pmax, dim)
    .. attribute:: mask    (nboxes, pmax) validity
    .. attribute:: index   (nboxes, pmax) tree-order particle index
    """

    def __init__(self, tree, which):
        coords = getattr(tree, which + "s")
        box_of = getattr(tree, f"box_id_of_{which}")
        starts = getattr(tree, f"box_{which}_starts")
        counts = getattr(tree, f"box_{which}_counts_nonchild")
        self.pmax = max(1, int(jnp.max(counts)))
        self.n = coords.shape[1]
        self.points, self.mask, self.index = _build_blocks(
            coords, box_of, starts, nboxes=tree.nboxes, pmax=self.pmax)

    def gather_values(self, particle_values):
        """(nboxes, pmax) block view of a per-particle array (0 where
        padded)."""
        vals = particle_values[jnp.clip(self.index, 0, self.n - 1)]
        return jnp.where(self.mask, vals, 0)

    def scatter_add(self, out, block_values):
        """Add (nboxes, pmax) block values back to a per-particle array."""
        safe_idx = jnp.where(self.mask, self.index, out.shape[0])
        return out.at[safe_idx].add(
            jnp.where(self.mask, block_values, 0), mode="drop")


def csr_rows(starts, nedges):
    """Row index of every edge in a CSR list (jit-safe)."""
    return (jnp.searchsorted(
        starts.astype(jnp.int64),
        jnp.arange(nedges, dtype=jnp.int64), side="right") - 1)


class M2LClassPlan:
    """Per-level, per-translation-class execution plan for M2L.

    Mirrors the role of ``boxtree/translation_classes.py``: each List-2
    (box, box) pair is classified by its integer translation vector
    ``cell(target) - cell(source)`` (same level), and edges are re-sorted
    so that each class is a contiguous run — letting the M2L apply run as
    one dense (nedges_c, ncoeff) x (ncoeff, ncoeff) matmul per class.

    .. attribute:: levels

        list of ``(level, tgt_boxes, src_boxes, class_slices)`` where
        ``class_slices`` maps class id -> (start, stop) into the edge
        arrays.
    """

    def __init__(self, traversal, offsets):
        """:arg offsets: (nclasses, dim) int array of allowed translation
        vectors (the List-2 window)."""
        tree = traversal.tree
        self.offsets = np.asarray(offsets)
        self.nclasses = len(self.offsets)
        d = tree.dimensions

        # classify on host (one-time setup)
        from boxtree_tpu.ops import morton
        cells = np.asarray(morton.deinterleave(
            tree.box_morton_prefixes, d))          # (d, nboxes)
        levels = np.asarray(tree.box_levels)
        totp = np.asarray(traversal.target_or_target_parent_boxes)
        starts = np.asarray(traversal.from_sep_siblings_starts)
        lists = np.asarray(traversal.from_sep_siblings_lists)
        ls_totp = np.asarray(
            traversal.level_start_target_or_target_parent_box_nrs)

        # offset -> class id lookup (dense table over the offset window)
        radius = int(np.abs(self.offsets).max())
        width = 2 * radius + 1
        weights = width ** np.arange(d)
        table = np.full(width ** d, -1, np.int64)
        table[(self.offsets + radius) @ weights] = np.arange(self.nclasses)

        self.levels = []
        for lev in range(tree.nlevels):
            r0, r1 = int(ls_totp[lev]), int(ls_totp[lev + 1])
            e0, e1 = int(starts[r0]), int(starts[r1])
            if e1 == e0:
                continue
            rows = np.searchsorted(
                starts, np.arange(e0, e1), side="right") - 1
            tgt = totp[rows]
            src = lists[e0:e1]
            dvec = (cells[:, tgt] - cells[:, src]).T   # (nedges, d)
            cls = table[(dvec + radius) @ weights]
            assert (cls >= 0).all(), "List-2 edge outside translation window"
            order = np.argsort(cls, kind="stable")
            tgt, src, cls = tgt[order], src[order], cls[order]
            class_slices = {}
            bounds = np.searchsorted(cls, np.arange(self.nclasses + 1))
            for c in range(self.nclasses):
                if bounds[c + 1] > bounds[c]:
                    class_slices[c] = (int(bounds[c]), int(bounds[c + 1]))
            self.levels.append((lev, jnp.asarray(tgt.astype(np.int32)),
                                jnp.asarray(src.astype(np.int32)),
                                class_slices))
