"""FMM cost model: per-stage and per-box operation counts, translation
cost formulas, and calibration against measured timings.

Mirrors ``boxtree/cost.py``:

- :class:`FMMTranslationCostModel` (``cost.py:87-147``): symbolic-ish
  per-translation costs parameterized by expansion size.  Both the
  PDE-aware ``(p+1)^(d-1)`` flavor (with point-and-shoot M2L:
  ``nsrc^1.5 + nsrc^0.5 ntgt + ntgt^1.5``) and the Taylor ``(p+1)^d``
  flavor are provided (``cost.py:152-179``).
- :class:`FMMCostModel` (``cost.py:186-1257``): evaluates the model over
  a built traversal, either aggregated per stage (``cost_per_stage``,
  ``cost.py:527``) or distributed over boxes (``cost_per_box``,
  ``cost.py:445`` — the input to distributed load balancing), plus
  least-squares calibration (``estimate_calibration_params``,
  ``cost.py:650-708``).

Two evaluation flavors are provided, mirroring the reference's
OpenCL/Python split (``cost.py:715`` vs ``cost.py:1264``):
:class:`FMMCostModel` evaluates on device (jnp segment reductions over
the traversal's CSR arrays) and :class:`PythonFMMCostModel` with
vectorized numpy on the host.
"""

from __future__ import annotations

import numpy as np


class FMMTranslationCostModel:
    """Per-translation cost formulas.  Each method returns the cost of one
    translation as a function of the calibration-parameter dict."""

    def __init__(self, ncoeffs_fmm_by_level, uses_point_and_shoot=False):
        self.ncoeffs_fmm_by_level = np.asarray(ncoeffs_fmm_by_level,
                                               np.float64)
        self.uses_point_and_shoot = uses_point_and_shoot

    def p2qbxl(self):
        return 1.0

    def p2p(self):
        return 1.0

    def p2m(self, level):
        return self.ncoeffs_fmm_by_level[level]

    def l2p(self, level):
        return self.ncoeffs_fmm_by_level[level]

    def m2p(self, level):
        return self.ncoeffs_fmm_by_level[level]

    def p2l(self, level):
        return self.ncoeffs_fmm_by_level[level]

    def m2m(self, src_level, tgt_level):
        return self.e2e_cost(self.ncoeffs_fmm_by_level[src_level],
                             self.ncoeffs_fmm_by_level[tgt_level])

    def l2l(self, src_level, tgt_level):
        return self.e2e_cost(self.ncoeffs_fmm_by_level[src_level],
                             self.ncoeffs_fmm_by_level[tgt_level])

    def m2l(self, src_level, tgt_level):
        return self.e2e_cost(self.ncoeffs_fmm_by_level[src_level],
                             self.ncoeffs_fmm_by_level[tgt_level])

    def e2e_cost(self, nsource_coeffs, ntarget_coeffs):
        """Expansion-to-expansion translation cost
        (``boxtree/cost.py:134-147``)."""
        if self.uses_point_and_shoot:
            return (nsource_coeffs ** 1.5
                    + nsource_coeffs ** 0.5 * ntarget_coeffs
                    + ntarget_coeffs ** 1.5)
        return nsource_coeffs * ntarget_coeffs


def make_pde_aware_translation_cost_model(dim, nlevels):
    """Costs for FMMs with PDE-aware expansion counts ~ (p+1)^(d-1)
    (``boxtree/cost.py:152-166``).  The returned model is a function of
    per-level orders supplied at evaluation time via
    ``level_to_order``."""
    return _DeferredOrderCostModel(
        lambda p: (p + 1) ** (dim - 1), nlevels,
        uses_point_and_shoot=(dim == 3))


def make_taylor_translation_cost_model(dim, nlevels):
    """Costs for Taylor-expansion FMMs ~ (p+1)^d
    (``boxtree/cost.py:169-179``)."""
    return _DeferredOrderCostModel(
        lambda p: (p + 1) ** dim, nlevels, uses_point_and_shoot=False)


class _DeferredOrderCostModel:
    def __init__(self, ncoeffs_of_order, nlevels, uses_point_and_shoot):
        self.ncoeffs_of_order = ncoeffs_of_order
        self.nlevels = nlevels
        self.uses_point_and_shoot = uses_point_and_shoot

    def with_orders(self, level_to_order):
        ncoeffs = [self.ncoeffs_of_order(level_to_order[lev])
                   for lev in range(self.nlevels)]
        return FMMTranslationCostModel(
            ncoeffs, uses_point_and_shoot=self.uses_point_and_shoot)


FMM_STAGES = (
    "form_multipoles", "coarsen_multipoles", "eval_direct",
    "multipole_to_local", "eval_multipoles", "form_locals",
    "refine_locals", "eval_locals")


class AbstractFMMCostModel:
    """Shared stage-count machinery; see :class:`FMMCostModel`."""

    def __init__(self, translation_cost_model_factory=None):
        self.translation_cost_model_factory = (
            translation_cost_model_factory
            or make_pde_aware_translation_cost_model)

    # {{{ raw per-stage / per-box operation counts

    def _gather(self, traversal):
        tree = traversal.tree
        g = {}
        g["levels"] = np.asarray(tree.box_levels)
        g["src_cnt"] = np.asarray(
            tree.box_source_counts_nonchild).astype(np.int64)
        g["tgt_cnt"] = np.asarray(
            tree.box_target_counts_nonchild).astype(np.int64)
        g["parents"] = np.asarray(tree.box_parent_ids)
        g["source_boxes"] = np.asarray(traversal.source_boxes)
        g["target_boxes"] = np.asarray(traversal.target_boxes)
        g["totp"] = np.asarray(traversal.target_or_target_parent_boxes)
        g["spb"] = np.asarray(traversal.source_parent_boxes)
        g["l1_starts"] = np.asarray(traversal.neighbor_source_boxes_starts)
        g["l1_lists"] = np.asarray(traversal.neighbor_source_boxes_lists)
        g["l2_starts"] = np.asarray(traversal.from_sep_siblings_starts)
        g["l2_lists"] = np.asarray(traversal.from_sep_siblings_lists)
        g["l4_starts"] = np.asarray(traversal.from_sep_bigger_starts)
        g["l4_lists"] = np.asarray(traversal.from_sep_bigger_lists)
        return g

    @staticmethod
    def _row_of_edge(starts):
        counts = np.diff(starts)
        return np.repeat(np.arange(len(counts)), counts)

    # }}}

    def cost_per_stage(self, traversal, level_to_order,
                       calibration_params=None):
        """Modeled cost of every FMM stage (dict stage -> float).
        Mirrors ``boxtree/cost.py:527-648``."""
        tree = traversal.tree
        xlat = self.translation_cost_model_factory(
            tree.dimensions, tree.nlevels).with_orders(level_to_order)
        c = calibration_params or self.get_unit_calibration_params()
        g = self._gather(traversal)
        lev = g["levels"]

        out = {}
        # P2M: nonchild sources per source box
        out["form_multipoles"] = float(np.sum(
            g["src_cnt"][g["source_boxes"]]
            * xlat.p2m(lev[g["source_boxes"]]))) * c["c_p2m"]

        # M2M: one link per child of a source-parent box
        spb_mask = np.zeros(tree.nboxes, bool)
        spb_mask[g["spb"]] = True
        b_all = np.arange(1, tree.nboxes)
        links = b_all[spb_mask[g["parents"][b_all]]]
        out["coarsen_multipoles"] = float(np.sum(
            xlat.m2m(lev[links], lev[g["parents"][links]]))) * c["c_m2m"]

        # P2P over list 1
        rows = self._row_of_edge(g["l1_starts"])
        tgt_of_edge = g["target_boxes"][rows]
        out["eval_direct"] = float(np.sum(
            g["tgt_cnt"][tgt_of_edge].astype(np.float64)
            * g["src_cnt"][g["l1_lists"]])) * c["c_p2p"]

        # M2L over list 2
        rows = self._row_of_edge(g["l2_starts"])
        tgt_of_edge = g["totp"][rows]
        out["multipole_to_local"] = float(np.sum(
            xlat.m2l(lev[g["l2_lists"]], lev[tgt_of_edge]))) * c["c_m2l"]

        # M2P over per-level list 3
        m2p = 0.0
        for lvl, ssn in enumerate(traversal.from_sep_smaller_by_level):
            if ssn.count == 0:
                continue
            starts = np.asarray(ssn.starts)
            rows = self._row_of_edge(starts)
            tb = np.asarray(
                traversal.target_boxes_sep_smaller_by_source_level[lvl])
            m2p += np.sum(g["tgt_cnt"][tb[rows]].astype(np.float64)
                          * xlat.m2p(lvl))
        out["eval_multipoles"] = float(m2p) * c["c_m2p"]

        # P2L over list 4
        rows = self._row_of_edge(g["l4_starts"])
        tgt_of_edge = g["totp"][rows]
        out["form_locals"] = float(np.sum(
            g["src_cnt"][g["l4_lists"]].astype(np.float64)
            * xlat.p2l(lev[tgt_of_edge]))) * c["c_p2l"]

        # L2L: one per non-root target-or-target-parent box
        totp = g["totp"]
        nonroot = totp[lev[totp] > 0]
        out["refine_locals"] = float(np.sum(
            xlat.l2l(lev[g["parents"][nonroot]], lev[nonroot]))) \
            * c["c_l2l"]

        # L2P
        out["eval_locals"] = float(np.sum(
            g["tgt_cnt"][g["target_boxes"]]
            * xlat.l2p(lev[g["target_boxes"]]))) * c["c_l2p"]

        return out

    def cost_per_box(self, traversal, level_to_order,
                     calibration_params=None):
        """Modeled cost attributed to each box (nboxes,) — the input to
        distributed load balancing (``boxtree/cost.py:445-525``)."""
        tree = traversal.tree
        xlat = self.translation_cost_model_factory(
            tree.dimensions, tree.nlevels).with_orders(level_to_order)
        c = calibration_params or self.get_unit_calibration_params()
        g = self._gather(traversal)
        lev = g["levels"]
        cost = np.zeros(tree.nboxes, np.float64)

        sb = g["source_boxes"]
        cost[sb] += g["src_cnt"][sb] * xlat.p2m(lev[sb]) * c["c_p2m"]

        spb_mask = np.zeros(tree.nboxes, bool)
        spb_mask[g["spb"]] = True
        b_all = np.arange(1, tree.nboxes)
        links = b_all[spb_mask[g["parents"][b_all]]]
        np.add.at(cost, g["parents"][links],
                  xlat.m2m(lev[links], lev[g["parents"][links]])
                  * c["c_m2m"])

        rows = self._row_of_edge(g["l1_starts"])
        tgt_of_edge = g["target_boxes"][rows]
        np.add.at(cost, tgt_of_edge,
                  g["tgt_cnt"][tgt_of_edge].astype(np.float64)
                  * g["src_cnt"][g["l1_lists"]] * c["c_p2p"])

        rows = self._row_of_edge(g["l2_starts"])
        tgt_of_edge = g["totp"][rows]
        np.add.at(cost, tgt_of_edge,
                  xlat.m2l(lev[g["l2_lists"]], lev[tgt_of_edge])
                  * c["c_m2l"])

        for lvl, ssn in enumerate(traversal.from_sep_smaller_by_level):
            if ssn.count == 0:
                continue
            starts = np.asarray(ssn.starts)
            rows = self._row_of_edge(starts)
            tb = np.asarray(
                traversal.target_boxes_sep_smaller_by_source_level[lvl])
            np.add.at(cost, tb[rows],
                      g["tgt_cnt"][tb[rows]].astype(np.float64)
                      * xlat.m2p(lvl) * c["c_m2p"])

        rows = self._row_of_edge(g["l4_starts"])
        tgt_of_edge = g["totp"][rows]
        np.add.at(cost, tgt_of_edge,
                  g["src_cnt"][g["l4_lists"]].astype(np.float64)
                  * xlat.p2l(lev[tgt_of_edge]) * c["c_p2l"])

        totp = g["totp"]
        nonroot = totp[lev[totp] > 0]
        cost[nonroot] += xlat.l2l(lev[g["parents"][nonroot]],
                                  lev[nonroot]) * c["c_l2l"]

        tb = g["target_boxes"]
        cost[tb] += g["tgt_cnt"][tb] * xlat.l2p(lev[tb]) * c["c_l2p"]
        return cost

    @staticmethod
    def get_unit_calibration_params():
        """All-ones calibration (mirrors ``boxtree/cost.py:640-648``)."""
        return {f"c_{s}": 1.0 for s in
                ("p2m", "m2m", "p2p", "m2l", "m2p", "p2l", "l2l", "l2p")}

    def estimate_calibration_params(self, model_results, timing_results,
                                    wall_time_field="wall_elapsed"):
        """Least-squares fit of per-stage parameters from modeled counts
        and measured stage timings (``boxtree/cost.py:650-708``).

        :arg model_results: list of per-stage count dicts (from
            ``cost_per_stage`` with unit calibration).
        :arg timing_results: list of dicts stage -> seconds.
        """
        stage_to_param = {
            "form_multipoles": "c_p2m", "coarsen_multipoles": "c_m2m",
            "eval_direct": "c_p2p", "multipole_to_local": "c_m2l",
            "eval_multipoles": "c_m2p", "form_locals": "c_p2l",
            "refine_locals": "c_l2l", "eval_locals": "c_l2p"}
        params = {}
        for stage, pname in stage_to_param.items():
            counts = np.array([m[stage] for m in model_results])
            times = np.array([t.get(stage, 0.0) for t in timing_results])
            denom = np.sum(counts * counts)
            params[pname] = float(np.sum(counts * times) / denom) \
                if denom > 0 else 0.0
        return params


class PythonFMMCostModel(AbstractFMMCostModel):
    """Host (numpy) cost evaluation — the analogue of the reference's
    pure-Python flavor (``boxtree/cost.py:1264``)."""

    @staticmethod
    def aggregate_over_boxes(per_box):
        return float(np.sum(np.asarray(per_box)))


class FMMCostModel(AbstractFMMCostModel):
    """Device-side (jnp) cost evaluation — the analogue of the
    reference's OpenCL flavor (``boxtree/cost.py:715-1257``).  All
    per-edge and per-box arithmetic runs on device over the traversal's
    CSR arrays (which already live there); only the tiny per-level
    operator-cost tables are built on host.  The cost vector stays on
    device, so large-tree load balancing doesn't bounce through the
    host."""

    @staticmethod
    def aggregate_over_boxes(per_box):
        import jax.numpy as jnp
        return float(jnp.sum(per_box))

    def _tables(self, tree, level_to_order, c):
        import jax.numpy as jnp
        nlevels = tree.nlevels
        xlat = self.translation_cost_model_factory(
            tree.dimensions, nlevels).with_orders(level_to_order)
        levs = range(nlevels)

        def t1(f, cc):
            return jnp.asarray([float(f(lv)) * cc for lv in levs])

        def t2(f, cc):
            return jnp.asarray([[float(f(s, t)) * cc for t in levs]
                                for s in levs])

        return {
            "p2m": t1(xlat.p2m, c["c_p2m"]),
            "l2p": t1(xlat.l2p, c["c_l2p"]),
            "m2p": t1(xlat.m2p, c["c_m2p"]),
            "p2l": t1(xlat.p2l, c["c_p2l"]),
            "m2m": t2(xlat.m2m, c["c_m2m"]),
            "l2l": t2(xlat.l2l, c["c_l2l"]),
            "m2l": t2(xlat.m2l, c["c_m2l"]),
        }

    def _stage_terms(self, traversal, level_to_order, c):
        """Per stage: (box ids, per-term device costs) scatter pairs."""
        import jax.numpy as jnp

        from boxtree_tpu.models.particle_blocks import csr_rows

        tree = traversal.tree
        t = self._tables(tree, level_to_order, c)
        lev = tree.box_levels
        src_cnt = tree.box_source_counts_nonchild.astype(jnp.float64)
        tgt_cnt = tree.box_target_counts_nonchild.astype(jnp.float64)
        parents = tree.box_parent_ids
        terms = {}

        sb = traversal.source_boxes
        terms["form_multipoles"] = (sb, src_cnt[sb] * t["p2m"][lev[sb]])

        # M2M: one link per box whose parent is a source-parent box
        spb_mask = jnp.zeros(tree.nboxes, bool).at[
            traversal.source_parent_boxes].set(True)
        ball = jnp.arange(1, tree.nboxes)
        pball = parents[ball]
        is_link = spb_mask[pball]
        terms["coarsen_multipoles"] = (
            jnp.where(is_link, pball, 0),
            jnp.where(is_link, t["m2m"][lev[ball], lev[pball]], 0.0))

        l1 = traversal.neighbor_source_boxes_lists
        rows = csr_rows(traversal.neighbor_source_boxes_starts,
                        int(l1.shape[0]))
        tgt = traversal.target_boxes[rows]
        terms["eval_direct"] = (
            tgt, tgt_cnt[tgt] * src_cnt[l1] * c["c_p2p"])

        l2 = traversal.from_sep_siblings_lists
        rows = csr_rows(traversal.from_sep_siblings_starts,
                        int(l2.shape[0]))
        tgt = traversal.target_or_target_parent_boxes[rows]
        terms["multipole_to_local"] = (tgt, t["m2l"][lev[l2], lev[tgt]])

        m2p_idx, m2p_val = [], []
        for lvl, ssn in enumerate(traversal.from_sep_smaller_by_level):
            if ssn.count == 0:
                continue
            rows = csr_rows(ssn.starts, int(ssn.lists.shape[0]))
            tb = traversal.target_boxes_sep_smaller_by_source_level[
                lvl][rows]
            m2p_idx.append(tb)
            m2p_val.append(tgt_cnt[tb] * t["m2p"][lvl])
        terms["eval_multipoles"] = (
            (jnp.concatenate(m2p_idx), jnp.concatenate(m2p_val))
            if m2p_idx else
            (jnp.zeros(0, jnp.int64), jnp.zeros(0, jnp.float64)))

        l4 = traversal.from_sep_bigger_lists
        rows = csr_rows(traversal.from_sep_bigger_starts,
                        int(l4.shape[0]))
        tgt = traversal.target_or_target_parent_boxes[rows]
        terms["form_locals"] = (tgt, src_cnt[l4] * t["p2l"][lev[tgt]])

        totp = traversal.target_or_target_parent_boxes
        nonroot = lev[totp] > 0
        terms["refine_locals"] = (
            totp, jnp.where(nonroot,
                            t["l2l"][lev[parents[totp]], lev[totp]], 0.0))

        tb = traversal.target_boxes
        terms["eval_locals"] = (tb, tgt_cnt[tb] * t["l2p"][lev[tb]])
        return terms

    def cost_per_stage(self, traversal, level_to_order,
                       calibration_params=None):
        c = calibration_params or self.get_unit_calibration_params()
        terms = self._stage_terms(traversal, level_to_order, c)
        import jax.numpy as jnp
        return {k: float(jnp.sum(v)) for k, (_i, v) in terms.items()}

    def cost_per_box(self, traversal, level_to_order,
                     calibration_params=None):
        import jax.numpy as jnp
        c = calibration_params or self.get_unit_calibration_params()
        terms = self._stage_terms(traversal, level_to_order, c)
        cost = jnp.zeros(traversal.tree.nboxes, jnp.float64)
        for idx, val in terms.values():
            cost = cost.at[idx].add(val)
        return cost


_PythonFMMCostModel = PythonFMMCostModel
