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


def grouped_matmul(lhs, ops, group_sizes):
    """``out[i] = lhs[i] @ ops[g(i)]`` where rows of each group are
    contiguous (MegaBlocks-style grouped GEMM; one MXU-batched
    ``jax.lax.ragged_dot``).  Complex operands decompose into real
    ragged_dots, which keeps the op TPU-lowerable."""
    lc = jnp.iscomplexobj(lhs)
    oc = jnp.iscomplexobj(ops)
    if not (lc or oc):
        return jax.lax.ragged_dot(lhs, ops, group_sizes)
    rd = jax.lax.ragged_dot
    if lc and oc:
        lr, li = jnp.real(lhs), jnp.imag(lhs)
        opr, opi = jnp.real(ops), jnp.imag(ops)
        return ((rd(lr, opr, group_sizes) - rd(li, opi, group_sizes))
                + 1j * (rd(lr, opi, group_sizes)
                        + rd(li, opr, group_sizes)))
    if lc:
        return (rd(jnp.real(lhs), ops, group_sizes)
                + 1j * rd(jnp.imag(lhs), ops, group_sizes))
    return (rd(lhs, jnp.real(ops), group_sizes)
            + 1j * rd(lhs, jnp.imag(ops), group_sizes))


class M2LPlan:
    """Flattened, operator-grouped M2L execution plan.

    Plays the role of ``boxtree/translation_classes.py``: every List-2
    (box, box) pair — across *all* levels — is classified by its integer
    translation vector ``cell(target) - cell(source)``, and the edges are
    sorted so each (level, class) operator's edges form one contiguous
    run.  The whole M2L stage then runs as ONE grouped matmul
    (:func:`grouped_matmul`) instead of one XLA op per (level, class).

    .. attribute:: used

        list of ``(level, class_id)`` pairs actually present; defines the
        operator-table order wranglers must build.

    .. attribute:: tgt, src

        (E,) int32 device arrays of edge target/source boxes, sorted by
        operator id.

    .. attribute:: group_sizes

        (nops,) int32 device array of edges per operator.
    """

    def __init__(self, traversal, offsets):
        """:arg offsets: (nclasses, dim) int array of allowed translation
        vectors (the List-2 window)."""
        tree = traversal.tree
        self.offsets = np.asarray(offsets)
        self.nclasses = len(self.offsets)
        d = tree.dimensions

        # host-side classification machinery (one-time setup)
        from boxtree_tpu.ops import morton
        self._cells = np.asarray(morton.deinterleave(
            tree.box_morton_prefixes, d))          # (d, nboxes)
        self._levels = np.asarray(tree.box_levels)
        self._radius = int(np.abs(self.offsets).max())
        width = 2 * self._radius + 1
        self._weights = width ** np.arange(d)
        self._table = np.full(width ** d, -1, np.int64)
        self._table[(self.offsets + self._radius) @ self._weights] = \
            np.arange(self.nclasses)

        totp = np.asarray(traversal.target_or_target_parent_boxes)
        starts = np.asarray(traversal.from_sep_siblings_starts)
        lists = np.asarray(traversal.from_sep_siblings_lists)
        counts = np.diff(starts)
        rows = np.repeat(np.arange(len(counts)), counts)
        tgt = totp[rows]
        src = lists

        opkey = self._opkey(tgt, src)
        self._used_keys = np.unique(opkey)
        self.used = [(int(k) // self.nclasses, int(k) % self.nclasses)
                     for k in self._used_keys]
        self.nops = len(self._used_keys)

        opid = np.searchsorted(self._used_keys, opkey)
        order = np.argsort(opid, kind="stable")
        self.tgt = jnp.asarray(tgt[order].astype(np.int32))
        self.src = jnp.asarray(src[order].astype(np.int32))
        self.group_sizes = jnp.asarray(np.bincount(
            opid, minlength=self.nops).astype(np.int32))

    def _opkey(self, tgt, src):
        dvec = (self._cells[:, tgt] - self._cells[:, src]).T
        cls = self._table[(dvec + self._radius) @ self._weights]
        assert (cls >= 0).all(), "List-2 edge outside translation window"
        return self._levels[tgt].astype(np.int64) * self.nclasses + cls

    def classify(self, tgt, src):
        """Operator ids (indices into :attr:`used`) for host edge arrays;
        every edge must use an operator present in the global plan."""
        opkey = self._opkey(np.asarray(tgt), np.asarray(src))
        opid = np.searchsorted(self._used_keys, opkey)
        ok = (opid < self.nops) & (self._used_keys[
            np.clip(opid, 0, self.nops - 1)] == opkey)
        assert ok.all(), "edge uses an operator absent from the plan"
        return opid
