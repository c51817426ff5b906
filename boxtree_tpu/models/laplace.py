"""Native 2D Laplace expansion wrangler (complex power series).

This is the TPU-native replacement for the reference's pyfmmlib (Fortran)
backend in two dimensions (``boxtree/pyfmmlib_integration.py:276-1162``):
the kernel is ``G(t, s) = log(t - s)`` in complex form, so the potential
for real charges is ``Re(phi) = sum q log|t - s|``.

Expansions (about a box center ``c``, ``w = z - c``):

- multipole: ``phi(z) = a_0 log w + sum_{k=1..p} a_k w^{-k}``
- local:     ``phi(z) = sum_{l=0..p} b_l w^l``

All translation operators (M2M, M2L, L2L) are dense (p+1)x(p+1) complex
matrices precomputed on the host per (level, child-digit) for M2M/L2L and
per *translation class* for M2L (the role of
``boxtree/translation_classes.py``), so the hot M2L stage becomes a
handful of dense matmuls per level — MXU work instead of the reference's
per-interaction Fortran calls.

P2P / M2P / P2L run over fixed-shape per-box particle blocks
(:class:`~boxtree_tpu.models.particle_blocks.ParticleBlocks`), chunked
with ``lax.map`` to bound memory.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from boxtree_tpu.fmm.drive import (
    ExpansionWranglerInterface,
    TreeIndependentDataForWrangler,
)
from boxtree_tpu.models.particle_blocks import (
    M2LClassPlan,
    ParticleBlocks,
    csr_rows,
)
from boxtree_tpu.traversal.build import _offsets


def _binom_table(p):
    c = np.zeros((2 * p + 2, 2 * p + 2))
    c[:, 0] = 1
    for i in range(1, 2 * p + 2):
        for j in range(1, i + 1):
            c[i, j] = c[i - 1, j - 1] + c[i - 1, j]
    return c


class LaplaceTreeIndependentDataForWrangler(TreeIndependentDataForWrangler):
    """Holds the expansion order and binomial tables."""

    def __init__(self, dim, order):
        if dim != 2:
            raise NotImplementedError(
                "the complex-series Laplace wrangler is 2D; use the "
                "spherical-harmonics wrangler for 3D")
        self.dim = dim
        self.order = order
        self.binom = _binom_table(order)


# {{{ host-side operator construction

def _m2m_matrix(t, p, binom):
    """a'_l = sum_k A[l,k] a_k for a center shift by t (old - new)."""
    a = np.zeros((p + 1, p + 1), np.complex128)
    a[0, 0] = 1.0
    tp = t ** np.arange(p + 1)
    for ell in range(1, p + 1):
        a[ell, 0] = -tp[ell] / ell
        for k in range(1, ell + 1):
            a[ell, k] = binom[ell - 1, k - 1] * tp[ell - k]
    return a


def _m2l_matrix(z0, p, binom):
    """b_l = sum_k B[l,k] a_k, z0 = c_src - c_tgt."""
    b = np.zeros((p + 1, p + 1), np.complex128)
    zinv = 1.0 / z0
    zpow = zinv ** np.arange(2 * p + 2)       # z0^{-n}
    b[0, 0] = np.log(-z0)
    for ell in range(1, p + 1):
        b[ell, 0] = -zpow[ell] / ell
    for ell in range(p + 1):
        for k in range(1, p + 1):
            b[ell, k] = ((-1) ** k) * binom[ell + k - 1, ell] \
                * zpow[ell + k]
    return b


def _l2l_matrix(t, p, binom):
    """b'_l = sum_k B[l,k] b_k for a center shift by t (old - new)."""
    b = np.zeros((p + 1, p + 1), np.complex128)
    tp = (-t) ** np.arange(p + 1)
    for ell in range(p + 1):
        for k in range(ell, p + 1):
            b[ell, k] = binom[k, ell] * tp[k - ell]
    return b

# }}}


def _complexify(coords):
    return coords[0] + 1j * coords[1]


class Laplace2DExpansionWrangler(ExpansionWranglerInterface):
    """2D Laplace FMM wrangler; see module docstring.

    :arg order: expansion order p (error ~ (1/3)^p for well-separated
        1-away interactions, cf. ``test/test_fmm.py:556-564``).
    """

    def __init__(self, tree_indep, traversal, dtype=np.complex128):
        super().__init__(tree_indep, traversal)
        tree = traversal.tree
        p = tree_indep.order
        self.order = p
        self.ncoeff = p + 1
        self.dtype = dtype

        self.src_blocks = ParticleBlocks(tree, "source")
        if tree.sources_are_targets:
            self.tgt_blocks = self.src_blocks
        else:
            self.tgt_blocks = ParticleBlocks(tree, "target")

        self._lsb = tree.level_start_box_nrs
        self._ls_totp = np.asarray(
            traversal.level_start_target_or_target_parent_box_nrs)
        self._ls_tgt = np.asarray(traversal.level_start_target_box_nrs)

        self.centers_z = _complexify(tree.box_centers)
        self.root_extent = tree.root_extent

        # M2L plan + per-class operators
        n = traversal.well_sep_is_n_away
        offs = _offsets(tree.dimensions, 2 * n + 1, min_inf_norm=n)
        self.m2l_plan = M2LClassPlan(traversal, offs)

        # per-(level, class) M2L operators: translation z0 = (c_src-c_tgt)
        # = -offset * box_size(level)  [offset = cell(tgt)-cell(src)]
        binom = tree_indep.binom
        root = float(np.asarray(tree.root_extent))
        self._m2l_ops = {}
        for (lev, _tgt, _src, class_slices) in self.m2l_plan.levels:
            size = root / (1 << lev)
            ops = {}
            for c in class_slices:
                off = self.m2l_plan.offsets[c]
                z0 = -(off[0] + 1j * off[1]) * size
                ops[c] = jnp.asarray(_m2l_matrix(z0, p, binom))
            self._m2l_ops[lev] = ops

        # per-(level, digit) M2M / L2L operators
        # child at level lev has center offset from parent:
        #   +- size(lev)/2 per axis, sign from the Morton digit
        # (x is the high bit of the digit: boxtree_tpu.ops.morton)
        self._m2m_ops = {}
        self._l2l_ops = {}
        for lev in range(1, tree.nlevels):
            size = root / (1 << lev)
            m2m, l2l = [], []
            for digit in range(4):
                sx = 1 if (digit >> 1) & 1 else -1
                sy = 1 if digit & 1 else -1
                child_off = (sx + 1j * sy) * (size / 2)
                # M2M: shift child center -> parent center, t = c_ch - c_par
                m2m.append(_m2m_matrix(child_off, p, binom))
                # L2L: shift parent center -> child center, t = c_par - c_ch
                l2l.append(_l2l_matrix(-child_off, p, binom))
            self._m2m_ops[lev] = jnp.asarray(np.stack(m2m))
            self._l2l_ops[lev] = jnp.asarray(np.stack(l2l))

        # child digit of every box (from its Morton prefix)
        self.box_digit = (tree.box_morton_prefixes & 3).astype(jnp.int32)

    # {{{ plumbing

    def multipole_expansion_zeros(self):
        return jnp.zeros((self.tree.nboxes, self.ncoeff), self.dtype)

    local_expansion_zeros = multipole_expansion_zeros

    def output_zeros(self):
        return jnp.zeros(self.tree.ntargets, self.dtype)

    def reorder_sources(self, source_array):
        return jnp.asarray(source_array)[self.tree.user_source_ids]

    def reorder_potentials(self, potentials):
        return potentials[self.tree.sorted_target_ids]

    def multipole_expansions_view(self, mpole_exps, level):
        return mpole_exps[self._lsb[level]:self._lsb[level + 1]]

    local_expansions_view = multipole_expansions_view

    # }}}

    # {{{ P2M

    def form_multipoles(self, level_start_source_box_nrs, source_boxes,
                        src_weight_vecs):
        src_weights, = src_weight_vecs
        tree = self.tree
        z = _complexify(tree.sources)
        zc = self.centers_z[tree.box_id_of_source]
        zeta = z - zc
        q = src_weights.astype(self.dtype)
        # u_0 = q ; u_k = -q zeta^k / k
        coeffs = [q]
        zp = jnp.ones_like(zeta)
        for k in range(1, self.ncoeff):
            zp = zp * zeta
            coeffs.append(-q * zp / k)
        u = jnp.stack(coeffs, axis=1)          # (nsources, K)
        mp = jnp.zeros((tree.nboxes, self.ncoeff), self.dtype)
        return mp.at[tree.box_id_of_source].add(u)

    # }}}

    # {{{ M2M / L2L

    def coarsen_multipoles(self, level_start_source_parent_box_nrs,
                           source_parent_boxes, mpoles):
        tree = self.tree
        parents = tree.box_parent_ids
        for lev in range(tree.nlevels - 1, 2, -1):
            b0, b1 = self._lsb[lev], self._lsb[lev + 1]
            ids = jnp.arange(b0, b1)
            mp = mpoles[ids]
            ops = self._m2m_ops[lev]           # (4, K, K)
            dig = self.box_digit[ids]
            shifted = jnp.zeros_like(mp)
            for d in range(4):
                sel = (dig == d)[:, None]
                shifted = shifted + jnp.where(
                    sel, mp @ ops[d].T, 0)
            mpoles = mpoles.at[parents[ids]].add(shifted)
        return mpoles

    def refine_locals(self, level_start_target_or_target_parent_box_nrs,
                      target_or_target_parent_boxes, local_exps):
        tree = self.tree
        parents = tree.box_parent_ids
        for lev in range(1, tree.nlevels):
            r0, r1 = self._ls_totp[lev], self._ls_totp[lev + 1]
            if r1 == r0:
                continue
            ids = target_or_target_parent_boxes[r0:r1]
            par_loc = local_exps[parents[ids]]
            ops = self._l2l_ops[lev]
            dig = self.box_digit[ids]
            shifted = jnp.zeros_like(par_loc)
            for d in range(4):
                sel = (dig == d)[:, None]
                shifted = shifted + jnp.where(sel, par_loc @ ops[d].T, 0)
            local_exps = local_exps.at[ids].add(shifted)
        return local_exps

    # }}}

    # {{{ M2L (batched by translation class)

    def multipole_to_local(self, level_start_target_or_target_parent_box_nrs,
                           target_or_target_parent_boxes, starts, lists,
                           mpole_exps):
        local_exps = self.local_expansion_zeros()
        for (lev, tgt, src, class_slices) in self.m2l_plan.levels:
            mp = mpole_exps[src]               # (ne, K)
            out = jnp.zeros_like(mp)
            ops = self._m2l_ops[lev]
            for c, (s0, s1) in class_slices.items():
                out = out.at[s0:s1].set(mp[s0:s1] @ ops[c].T)
            local_exps = local_exps.at[tgt].add(out)
        return local_exps

    # }}}

    # {{{ P2P (List 1 and close lists)

    def eval_direct(self, target_boxes, neighbor_sources_starts,
                    neighbor_sources_lists, src_weight_vecs):
        src_weights, = src_weight_vecs
        tree = self.tree
        nedges = int(neighbor_sources_lists.shape[0])
        pot = self.output_zeros()
        if nedges == 0:
            return pot

        rows = csr_rows(neighbor_sources_starts, nedges)
        tgt_of_edge = target_boxes[rows]
        src_of_edge = neighbor_sources_lists

        q_blocks = self.src_blocks.gather_values(
            src_weights.astype(self.dtype))

        tb, sb = self.tgt_blocks, self.src_blocks
        pt, mt = tb.points, tb.mask
        ps, ms = sb.points, sb.mask

        def edge_potential(edge):
            t_box, s_box = edge
            tp = pt[t_box]                     # (P_t, 2)
            sp = ps[s_box]                     # (P_s, 2)
            dx = tp[:, None, 0] - sp[None, :, 0]
            dy = tp[:, None, 1] - sp[None, :, 1]
            r2 = dx * dx + dy * dy
            g = 0.5 * jnp.log(jnp.where(r2 > 0, r2, 1.0))
            g = jnp.where((r2 > 0) & ms[s_box][None, :], g, 0.0)
            return (g.astype(self.dtype) @ q_blocks[s_box])  # (P_t,)

        chunk = 4096
        npad = -(-nedges // chunk) * chunk
        edges = jnp.stack([
            jnp.pad(tgt_of_edge, (0, npad - nedges)),
            jnp.pad(src_of_edge, (0, npad - nedges),
                    constant_values=0)], axis=1)
        valid = jnp.pad(jnp.ones(nedges, bool), (0, npad - nedges))

        pot_rows = jnp.zeros((target_boxes.shape[0] + 1, tb.pmax),
                             self.dtype)

        def body(carry, inp):
            pot_rows = carry
            edge_chunk, valid_chunk, row_chunk = inp
            vals = jax.vmap(edge_potential)(edge_chunk)
            safe_rows = jnp.where(valid_chunk, row_chunk,
                                  target_boxes.shape[0])
            pot_rows = pot_rows.at[safe_rows].add(vals, mode="drop")
            return pot_rows, None

        rows_p = jnp.pad(rows, (0, npad - nedges))
        pot_rows, _ = lax.scan(
            body, pot_rows,
            (edges.reshape(-1, chunk, 2),
             valid.reshape(-1, chunk),
             rows_p.reshape(-1, chunk)))

        # scatter per-row block potentials back to target particles
        pot_box = jnp.zeros((tree.nboxes, tb.pmax), self.dtype)
        pot_box = pot_box.at[target_boxes].set(
            pot_rows[:target_boxes.shape[0]])
        blk = pot_box  # (nboxes, P_t)
        vals = blk[tree.box_id_of_target,
                   jnp.arange(tree.ntargets)
                   - tree.box_target_starts.astype(jnp.int64)[
                       tree.box_id_of_target]]
        return vals

    # }}}

    # {{{ M2P (List 3)

    def eval_multipoles(self, target_boxes_by_source_level,
                        from_sep_smaller_by_level, mpole_exps):
        tree = self.tree
        tb = self.tgt_blocks
        pot_box = jnp.zeros((tree.nboxes, tb.pmax), self.dtype)

        for level, ssn in enumerate(from_sep_smaller_by_level):
            if ssn.count == 0:
                continue
            nedges = int(ssn.lists.shape[0])
            rows = csr_rows(ssn.starts, nedges)
            tgt_boxes = target_boxes_by_source_level[level][rows]
            src_boxes = ssn.lists

            def edge_eval(edge):
                t_box, s_box = edge
                w = (_complexify(tb.points[t_box].T)
                     - self.centers_z[s_box])      # (P_t,)
                mp = mpole_exps[s_box]
                winv = 1.0 / jnp.where(w == 0, 1.0, w)
                acc = mp[0] * jnp.log(jnp.where(w == 0, 1.0, w))
                wp = jnp.ones_like(w)
                for k in range(1, self.ncoeff):
                    wp = wp * winv
                    acc = acc + mp[k] * wp
                return acc

            chunk = 4096
            npad = -(-nedges // chunk) * chunk
            edges = jnp.stack([
                jnp.pad(tgt_boxes, (0, npad - nedges)),
                jnp.pad(src_boxes, (0, npad - nedges))], axis=1)
            valid = jnp.pad(jnp.ones(nedges, bool), (0, npad - nedges))

            def body(carry, inp):
                pot_box = carry
                edge_chunk, valid_chunk = inp
                vals = jax.vmap(edge_eval)(edge_chunk)
                safe = jnp.where(valid_chunk, edge_chunk[:, 0],
                                 tree.nboxes)
                pot_box = pot_box.at[safe].add(vals, mode="drop")
                return pot_box, None

            pot_box_pad = jnp.concatenate(
                [pot_box, jnp.zeros((1, tb.pmax), self.dtype)])
            pot_box_pad, _ = lax.scan(
                body, pot_box_pad,
                (edges.reshape(-1, chunk, 2), valid.reshape(-1, chunk)))
            pot_box = pot_box_pad[:tree.nboxes]

        vals = pot_box[tree.box_id_of_target,
                       jnp.arange(tree.ntargets)
                       - tree.box_target_starts.astype(jnp.int64)[
                           tree.box_id_of_target]]
        return vals

    # }}}

    # {{{ P2L (List 4)

    def form_locals(self, level_start_target_or_target_parent_box_nrs,
                    target_or_target_parent_boxes, starts, lists,
                    src_weight_vecs):
        src_weights, = src_weight_vecs
        tree = self.tree
        local_exps = self.local_expansion_zeros()
        nedges = int(lists.shape[0])
        if nedges == 0:
            return local_exps

        rows = csr_rows(starts, nedges)
        tgt_of_edge = target_or_target_parent_boxes[rows]
        src_of_edge = lists
        sb = self.src_blocks
        q_blocks = sb.gather_values(src_weights.astype(self.dtype))

        def edge_coeffs(edge):
            t_box, s_box = edge
            z0 = (_complexify(sb.points[s_box].T)
                  - self.centers_z[t_box])         # (P_s,)
            q = q_blocks[s_box]
            z0s = jnp.where(z0 == 0, 1.0, z0)
            z0inv = 1.0 / z0s
            coeffs = [jnp.sum(q * jnp.log(-z0s))]
            zp = jnp.ones_like(z0)
            for ell in range(1, self.ncoeff):
                zp = zp * z0inv
                coeffs.append(jnp.sum(-q * zp / ell))
            return jnp.stack(coeffs)

        chunk = 4096
        npad = -(-nedges // chunk) * chunk
        edges = jnp.stack([
            jnp.pad(tgt_of_edge, (0, npad - nedges)),
            jnp.pad(src_of_edge, (0, npad - nedges))], axis=1)
        valid = jnp.pad(jnp.ones(nedges, bool), (0, npad - nedges))

        loc_pad = jnp.concatenate(
            [local_exps, jnp.zeros((1, self.ncoeff), self.dtype)])

        def body(carry, inp):
            loc = carry
            edge_chunk, valid_chunk = inp
            vals = jax.vmap(edge_coeffs)(edge_chunk)
            safe = jnp.where(valid_chunk, edge_chunk[:, 0], tree.nboxes)
            return loc.at[safe].add(vals, mode="drop"), None

        loc_pad, _ = lax.scan(
            body, loc_pad,
            (edges.reshape(-1, chunk, 2), valid.reshape(-1, chunk)))
        return loc_pad[:tree.nboxes]

    # }}}

    # {{{ L2P

    def eval_locals(self, level_start_target_box_nrs, target_boxes,
                    local_exps):
        tree = self.tree
        z = _complexify(tree.targets)
        zc = self.centers_z[tree.box_id_of_target]
        w = z - zc
        loc = local_exps[tree.box_id_of_target]  # (ntargets, K)
        acc = loc[:, 0]
        wp = jnp.ones_like(w)
        for ell in range(1, self.ncoeff):
            wp = wp * w
            acc = acc + loc[:, ell] * wp
        return acc

    # }}}

    def finalize_potentials(self, potentials):
        return potentials
