"""Distributed FMM over a :class:`jax.sharding.Mesh`.

The TPU-native counterpart of ``boxtree/distributed/``: the octree is
partitioned into cost-balanced, Morton-DFS-contiguous box segments
(``boxtree/distributed/partition.py:60-121``), each mesh device owns one
segment, and the FMM runs SPMD under ``shard_map``:

- every device forms multipoles from *its* responsible sources only and
  the partial multipole trees are combined by the sparse
  relevance-filtered hypercube exchange (Lashuk et al.) of
  :func:`_mpole_exchange_schedule` — the analogue of the reference's
  ``communicate_mpoles`` (``boxtree/distributed/calculation.py:271-416``)
  with ``ppermute`` rounds of ``(nboxes_sent, ncoeff)`` expansion blocks
  instead of MPI messages (level-sliced ``_slice_mpoles``/
  ``_update_mpoles``, ``calculation.py:147-202``) — or, with
  ``communicate_mpoles="allreduce"``, one dense ``psum``
  (``calculation.py:288-294``),
- interaction-list work is divided by *row ownership*: each device gets
  the (zero-padded) slice of every list whose target row it owns, driven
  through the wrangler's ``*_edges`` stage forms, so per-device list work
  scales ~1/nranks with static SPMD shapes,
- the downward pass runs redundantly on the (shared) ancestor chains of
  each device's segment, so no communication is needed below the
  multipole exchange; potentials combine with a final masked ``psum``.

Any wrangler built on :class:`~boxtree_tpu.models.expansion_base.
ExpansionWranglerBase` (native Laplace/Helmholtz) plugs in via
*wrangler_factory* — the analogue of the reference's
``DistributedFMMLibExpansionWrangler``
(``boxtree/distributed/calculation.py:419-453``); the default is the
counting (constant-one) kernel, the reference's distributed correctness
oracle (``test/test_distributed.py:182-269``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boxtree_tpu.parallel.partition import get_box_masks, partition_work


def _csr_to_edges(starts, lists, rows_to_boxes, row_mask):
    """Flatten a CSR list to (target_box, source_box) edges for rows
    whose target box is selected by *row_mask* (host side)."""
    starts = np.asarray(starts)
    lists = np.asarray(lists)
    rows_to_boxes = np.asarray(rows_to_boxes)
    counts = np.diff(starts)
    row_of_edge = np.repeat(np.arange(len(counts)), counts)
    tgt = rows_to_boxes[row_of_edge]
    sel = row_mask[tgt]
    return np.stack([tgt[sel], lists[sel]], axis=1)


def _pad_stack(arrays, fill):
    m = max(1, max(a.shape[0] for a in arrays))
    out = np.full((len(arrays), m) + arrays[0].shape[1:], fill,
                  arrays[0].dtype if arrays[0].size else np.int64)
    for i, a in enumerate(arrays):
        out[i, :a.shape[0]] = a
    return out


def _mpole_exchange_schedule(needed, contrib, nboxes):
    """Host-precomputed sparse multipole-exchange schedule (the
    Lashuk-style relevance-filtered reduce-scatter of
    ``boxtree/distributed/calculation.py:271-416``, re-cast for static
    SPMD execution).

    XOR-hypercube rounds over the largest power-of-two subset, with
    fold-in/fold-out stages for leftover ranks.  Every stage is described
    by index tables: rank ``r`` sends ``mp[send_idx[r]]`` to its partner,
    which merges at ``recv_idx[r]``.  Messages are filtered by the boxes
    *needed* (multipole-source masks) by any rank the receiver can still
    reach, so message sizes track the partition locality instead of
    ``nboxes``.  Returns ``(stages, stats)`` where each stage is
    ``(perm, send_idx, recv_idx, op)`` with ``op`` "add" (disjoint
    contributions) or "set" (fold-out: the complete result replaces).
    """
    nranks = needed.shape[0]
    p2 = 1
    while p2 * 2 <= nranks:
        p2 *= 2
    extras = nranks - p2

    def eff(u):
        return u - p2 if u >= p2 else u

    contrib = contrib.copy()
    stage_kinds = ([("fold_in",)] if extras else []) \
        + [("hyper", k) for k in range(p2.bit_length() - 1)] \
        + ([("fold_out",)] if extras else [])

    stages = []
    stats = []
    for kind in stage_kinds:
        sends = []                      # (src, dst, box mask, op)
        if kind[0] == "fold_in":
            filt = needed.any(axis=0)
            for e in range(p2, nranks):
                sends.append((e, e - p2, contrib[e] & filt, "add"))
        elif kind[0] == "hyper":
            k = kind[1]
            for r in range(p2):
                t = r ^ (1 << k)
                group = [u for u in range(nranks)
                         if eff(u) % (2 << k) == t % (2 << k)]
                filt = needed[group].any(axis=0)
                sends.append((r, t, contrib[r] & filt, "add"))
        else:                           # fold_out
            for e in range(p2, nranks):
                sends.append((e - p2, e, contrib[e - p2] & needed[e],
                              "set"))

        if not sends:
            continue
        maxlen = max(1, max(int(m.sum()) for (_, _, m, _) in sends))
        send_idx = np.full((nranks, maxlen), -1, np.int32)
        recv_idx = np.full((nranks, maxlen), -1, np.int32)
        perm = []
        op = sends[0][3]
        for (src, dst, m, _) in sends:
            ids = np.nonzero(m)[0].astype(np.int32)
            send_idx[src, :len(ids)] = ids
            recv_idx[dst, :len(ids)] = ids
            perm.append((src, dst))
        for (src, dst, m, _) in sends:
            contrib[dst] |= m
        stages.append((tuple(perm), send_idx, recv_idx, op))
        stats.append({"stage": kind[0], "boxes": maxlen,
                      "ranks": len(sends)})
    return stages, stats


def _default_wrangler_factory(traversal):
    from boxtree_tpu.models.constant_one import (
        ConstantOneExpansionWrangler,
        ConstantOneTreeIndependentDataForWrangler,
    )
    return ConstantOneExpansionWrangler(
        ConstantOneTreeIndependentDataForWrangler(), traversal)


def _build_local_particles(wrangler, box_masks, nranks):
    """Per-rank local particle blocks (the analogue of the reference's
    ``generate_local_tree``, ``boxtree/distributed/local_tree.py:198-495``):
    each rank keeps only the source blocks of its point-source-or-
    responsible boxes and the target blocks of its responsible boxes,
    padded to uniform shapes and stacked for sharding.  The global box
    *skeleton* stays replicated — exactly like the reference's local
    trees, which keep the full box arrays and reduce the particle sets.

    Returns a dict of host arrays (leading axis = rank).
    """
    from boxtree_tpu.tree.containers import box_flags_enum as _F
    tree = wrangler.tree
    flags = np.asarray(tree.box_flags)
    is_src = (flags & _F.IS_SOURCE_BOX) != 0
    is_tgt = (flags & _F.IS_TARGET_BOX) != 0

    sb, tb = wrangler.src_blocks, wrangler.tgt_blocks
    src_pts = np.asarray(sb.points)
    src_mask = np.asarray(sb.mask)
    src_idx = np.asarray(sb.index)
    tgt_pts = np.asarray(tb.points)
    tgt_mask = np.asarray(tb.mask)
    tgt_idx = np.asarray(tb.index)
    src_dip = (None if wrangler.dipole_vec is None
               else np.asarray(wrangler._dip_blocks))

    nboxes = tree.nboxes
    out = {k: [] for k in (
        "src_boxes", "src_points", "src_pmask", "src_index",
        "src_row_of_box", "tgt_boxes", "tgt_points", "tgt_pmask",
        "tgt_index", "tgt_row_of_box")
        + (("src_dip",) if src_dip is not None else ())}
    for r in range(nranks):
        m = box_masks[r]
        sboxes = np.nonzero(
            (m.point_src_boxes | m.responsible_boxes) & is_src)[0]
        tboxes = np.nonzero(m.responsible_boxes & is_tgt)[0]
        srow = np.full(nboxes, -1, np.int32)
        srow[sboxes] = np.arange(len(sboxes), dtype=np.int32)
        trow = np.full(nboxes, -1, np.int32)
        trow[tboxes] = np.arange(len(tboxes), dtype=np.int32)
        out["src_boxes"].append(sboxes.astype(np.int32))
        out["src_points"].append(src_pts[sboxes])
        out["src_pmask"].append(src_mask[sboxes])
        out["src_index"].append(src_idx[sboxes])
        out["src_row_of_box"].append(srow)
        if src_dip is not None:
            out["src_dip"].append(src_dip[sboxes])
        out["tgt_boxes"].append(tboxes.astype(np.int32))
        out["tgt_points"].append(tgt_pts[tboxes])
        out["tgt_pmask"].append(tgt_mask[tboxes])
        out["tgt_index"].append(tgt_idx[tboxes])
        out["tgt_row_of_box"].append(trow)

    stacked = {}
    for key, arrs in out.items():
        if key.endswith("row_of_box"):
            stacked[key] = np.stack(arrs)
        else:
            fill = -1 if arrs[0].dtype.kind == "i" else 0
            stacked[key] = _pad_stack(arrs, fill)
    return stacked


class DistributedFMMRunner:
    """Set up and drive a distributed FMM over *mesh*.

    Mirrors ``boxtree/distributed/__init__.py:269-310``; instead of MPI
    ranks with local trees, devices of a 1D mesh own DFS segments of the
    (replicated) global tree and interaction-list work is pre-sliced per
    device.

    :arg wrangler_factory: ``traversal -> wrangler``; the wrangler must
        provide the ``*_edges`` stage forms (any
        :class:`~boxtree_tpu.models.expansion_base.ExpansionWranglerBase`
        subclass, or the counting wrangler).  Defaults to the counting
        kernel.
    :arg communicate_mpoles: "hypercube" (default) runs the sparse
        relevance-filtered exchange (`_mpole_exchange_schedule`);
        "allreduce" runs a dense ``psum`` (the reference's
        ``communicate_mpoles_via_allreduce`` debug path,
        ``boxtree/distributed/calculation.py:288-294``).
    :arg local_particles: keep only each rank's local particle blocks on
        device (sources of its point-source/responsible boxes, targets of
        its responsible boxes) so per-device particle memory scales
        ~1/nranks — the reference's local trees
        (``boxtree/distributed/local_tree.py:198-495``).  Requires an
        :class:`~boxtree_tpu.models.expansion_base.ExpansionWranglerBase`
        wrangler without dipoles.
    """

    def __init__(self, mesh, traversal, wrangler_factory=None,
                 cost_per_box=None, communicate_mpoles="hypercube",
                 local_particles=False):
        if communicate_mpoles not in ("hypercube", "allreduce"):
            raise ValueError(f"bad communicate_mpoles: "
                             f"{communicate_mpoles}")
        self.communicate_mpoles = communicate_mpoles
        if traversal.from_sep_close_smaller_starts is not None:
            raise NotImplementedError(
                "DistributedFMMRunner does not yet drive traversals with "
                "target extents (close halves of Lists 3/4 would be "
                "silently dropped); call traversal.merge_close_lists() "
                "or merge_close_lists(traversal) first")
        if isinstance(mesh, int):
            devs = np.array(jax.devices()[:mesh])
            mesh = Mesh(devs, ("ranks",))
        self.mesh = mesh
        self.traversal = traversal
        tree = traversal.tree
        self.tree = tree
        (self.axis_name,) = mesh.axis_names
        nranks = mesh.devices.size

        if wrangler_factory is None:
            wrangler_factory = _default_wrangler_factory
        self.wrangler = wrangler_factory(traversal)
        self.local_particles = bool(local_particles)
        if self.local_particles:
            if not hasattr(self.wrangler, "src_blocks"):
                raise TypeError(
                    "local_particles requires an ExpansionWranglerBase "
                    "wrangler (with particle blocks)")

        if cost_per_box is None:
            from boxtree_tpu.cost.model import FMMCostModel
            orders = {lev: 3 for lev in range(tree.nlevels)}
            cost_per_box = FMMCostModel().cost_per_box(traversal, orders)

        resp = partition_work(cost_per_box, traversal, nranks)
        self.box_masks = [get_box_masks(traversal, resp[r])
                          for r in range(nranks)]

        # per-rank flattened edge lists, padded and stacked
        tb = np.asarray(traversal.target_boxes)
        totp = np.asarray(traversal.target_or_target_parent_boxes)
        m2l_plan = getattr(self.wrangler, "m2l_plan", None)
        e1, e2, e3, e4 = [], [], [], []
        e2_gs = []
        for r in range(nranks):
            m = self.box_masks[r]
            local_rows = m.responsible_boxes | m.ancestor_boxes
            e1.append(_csr_to_edges(
                traversal.neighbor_source_boxes_starts,
                traversal.neighbor_source_boxes_lists, tb,
                m.responsible_boxes))
            edges2 = _csr_to_edges(
                traversal.from_sep_siblings_starts,
                traversal.from_sep_siblings_lists, totp, local_rows)
            if m2l_plan is not None and len(edges2):
                # sort this rank's List-2 edges by the global operator
                # order so the M2L grouped matmul applies per rank
                opid = m2l_plan.classify(edges2[:, 0], edges2[:, 1])
                order = np.argsort(opid, kind="stable")
                edges2 = edges2[order]
                e2_gs.append(np.bincount(
                    opid, minlength=m2l_plan.nops).astype(np.int32))
            else:
                e2_gs.append(np.zeros(
                    max(1, getattr(m2l_plan, "nops", 1) or 1), np.int32))
            e2.append(edges2)
            e4.append(_csr_to_edges(
                traversal.from_sep_bigger_starts,
                traversal.from_sep_bigger_lists, totp, local_rows))
            e3_parts = []
            for lvl, ssn in enumerate(traversal.from_sep_smaller_by_level):
                if ssn.count == 0:
                    continue
                tbl = np.asarray(
                    traversal.target_boxes_sep_smaller_by_source_level[
                        lvl])
                e3_parts.append(_csr_to_edges(
                    ssn.starts, ssn.lists, tbl, m.responsible_boxes))
            e3.append(np.concatenate(e3_parts, axis=0) if e3_parts
                      else np.zeros((0, 2), np.int64))

        def shard(arr):
            return jax.device_put(
                jnp.asarray(arr),
                NamedSharding(mesh, P(self.axis_name,
                                      *([None] * (arr.ndim - 1)))))

        self.e1 = shard(_pad_stack(e1, -1))
        self.e3 = shard(_pad_stack(e3, -1))
        self.e4 = shard(_pad_stack(e4, -1))
        # List-2 padding edges fold into the final operator group (they
        # are masked out by their -1 target before the matmul)
        e2_stack = _pad_stack(e2, -1)
        gs_stack = np.stack(e2_gs)
        pad_counts = e2_stack.shape[1] - np.array(
            [len(a) for a in e2], np.int32)
        gs_stack[:, -1] += pad_counts
        self.e2 = shard(e2_stack)
        self.e2_group_sizes = shard(gs_stack)

        # downward-pass row plan: per rank, (level, digit)-sorted
        # responsible+ancestor rows with cross-rank-uniform per-level
        # widths (static SPMD slices) — drives
        # ``refine_locals_rows_grouped``'s one-grouped-matmul-per-level
        # downward pass.
        box_lev = np.asarray(tree.box_levels)
        nchild = 2 ** tree.dimensions
        box_digit = (np.asarray(tree.box_morton_prefixes)
                     & (nchild - 1)).astype(np.int64)
        rows_by_rank = []
        lev_counts = np.zeros((nranks, tree.nlevels), np.int64)
        for r in range(nranks):
            m = self.box_masks[r]
            local_rows = m.responsible_boxes | m.ancestor_boxes
            ids = totp[local_rows[totp]]
            ids = ids[box_lev[ids] >= 1]
            ids = ids[np.lexsort((box_digit[ids], box_lev[ids]))]
            rows_by_rank.append(ids)
            lev_counts[r] = np.bincount(box_lev[ids],
                                        minlength=tree.nlevels)
        widths = lev_counts.max(axis=0)
        w_starts = np.concatenate([[0], np.cumsum(widths)])
        self._l2l_level_slices = tuple(
            (lev, int(w_starts[lev]), int(w_starts[lev + 1]))
            for lev in range(1, tree.nlevels) if widths[lev])
        rows_pad = np.full((nranks, max(1, int(w_starts[-1]))), -1,
                           np.int64)
        dsize = np.zeros((nranks, tree.nlevels, nchild), np.int32)
        for r in range(nranks):
            ids = rows_by_rank[r]
            lc = np.concatenate([[0], np.cumsum(lev_counts[r])])
            for lev in range(1, tree.nlevels):
                seg = ids[lc[lev]:lc[lev + 1]]
                rows_pad[r, w_starts[lev]:w_starts[lev] + len(seg)] = seg
                dsize[r, lev] = np.bincount(box_digit[seg],
                                            minlength=nchild)
                # level-block tail padding folds into the last digit
                # group; -1 ids drop their contributions
                dsize[r, lev, -1] += widths[lev] - len(seg)
        self.l2l_rows = shard(rows_pad)
        self.l2l_digit_sizes = shard(dsize)
        self.resp_masks = shard(np.stack(
            [m.responsible_boxes for m in self.box_masks]))

        # sparse multipole-exchange schedule (hypercube flavor)
        if communicate_mpoles == "hypercube" and nranks > 1:
            needed = np.stack(
                [m.multipole_src_boxes for m in self.box_masks])
            contrib = np.stack(
                [m.responsible_boxes | m.ancestor_boxes
                 for m in self.box_masks])
            stages, self.mpole_comm_stats = _mpole_exchange_schedule(
                needed, contrib, tree.nboxes)
            self._mpole_perms = tuple(s[0] for s in stages)
            self._mpole_ops = tuple(s[3] for s in stages)
            self._mpole_tables = tuple(
                (shard(s[1]), shard(s[2])) for s in stages)
        else:
            self.mpole_comm_stats = []
            self._mpole_perms = ()
            self._mpole_ops = ()
            self._mpole_tables = ()

        if self.local_particles:
            ld = _build_local_particles(self.wrangler, self.box_masks,
                                        nranks)
            self._local_src_index = ld["src_index"]       # host copies
            self._local_src_pmask = ld["src_pmask"]

            # P2M runs only over each rank's *responsible* source boxes
            # (cross-rank multipole contributions must stay disjoint);
            # the other local source blocks exist for P2P/P2L only.
            resp = np.stack([m.responsible_boxes for m in self.box_masks])
            sbx = ld["src_boxes"]
            sbx_resp = np.take_along_axis(
                resp, np.clip(sbx, 0, None), axis=1) & (sbx >= 0)
            ld["src_p2m_boxes"] = np.where(sbx_resp, sbx, -1)

            # re-map this rank's edge endpoints from global box ids to
            # local block rows (the reference's local-tree renumbering,
            # ``boxtree/distributed/local_tree.py:432-457``)
            srow, trow = ld["src_row_of_box"], ld["tgt_row_of_box"]

            def remap(edges, col_maps):
                out = []
                for r, a in enumerate(edges):
                    if len(a) == 0:
                        out.append(np.zeros((0, 2), np.int64))
                        continue
                    cols = []
                    for c, cmap in enumerate(col_maps):
                        cols.append(a[:, c] if cmap is None
                                    else cmap[r][a[:, c]])
                    out.append(np.stack(cols, axis=1))
                return shard(_pad_stack(out, -1))

            self.e1_local = remap(e1, (trow, srow))
            self.e3_local = remap(e3, (trow, None))
            self.e4_local = remap(e4, (None, srow))
            keep = ("src_points", "src_pmask", "src_p2m_boxes",
                    "tgt_boxes", "tgt_points", "tgt_pmask", "tgt_index")
            if "src_dip" in ld:
                keep = keep + ("src_dip",)
            else:
                # unused dummy (static has_dip branch in the step)
                ld["src_dip"] = np.zeros(
                    (nranks, 1, 1, tree.dimensions),
                    np.asarray(tree.sources).dtype)
                keep = keep + ("src_dip",)
            self._local = {k: shard(ld[k]) for k in keep}
            #: per-rank bytes of the local particle blocks (for the
            #: memory-scaling assertion in tests)
            self.local_bytes_per_rank = sum(
                ld[k][0].nbytes for k in keep)
            self._shard = shard
            self._step = self._build_step_local()
        else:
            self._step = self._build_step()

    # {{{ SPMD step

    def _make_mpole_exchange(self):
        """Shared closure: sparse relevance-filtered hypercube exchange
        of (nboxes_sent, ncoeff) expansion blocks, or dense psum."""
        axis = self.axis_name
        nboxes = self.tree.nboxes
        mpole_perms = self._mpole_perms
        mpole_ops = self._mpole_ops
        use_hypercube = bool(mpole_perms)

        def exchange_mpoles(mp, mpole_tables):
            if not use_hypercube:
                return jax.lax.psum(mp, axis)
            trail = (1,) * (mp.ndim - 1)
            for (send_idx, recv_idx), perm, op in zip(
                    mpole_tables, mpole_perms, mpole_ops):
                si = send_idx[0].astype(jnp.int64)
                ri = recv_idx[0].astype(jnp.int64)
                buf = jnp.where((si >= 0).reshape(si.shape + trail),
                                mp[jnp.clip(si, 0)], 0)
                recv = jax.lax.ppermute(buf, axis, perm)
                safe = jnp.where(ri >= 0, ri, nboxes)
                if op == "add":
                    mp = mp.at[safe].add(
                        jnp.where((ri >= 0).reshape(ri.shape + trail),
                                  recv, 0), mode="drop")
                else:
                    mp = mp.at[safe].set(recv, mode="drop")
            return mp

        return exchange_mpoles

    def _build_step(self):
        tree = self.tree
        box_of_src = tree.box_id_of_source
        axis = self.axis_name
        wrangler = self.wrangler
        pot_box_map = wrangler.potential_box_map()
        exchange_mpoles = self._make_mpole_exchange()

        l2l_slices = self._l2l_level_slices

        def step(resp_mask, e1, e2, e2_gs, e3, e4, l2l_rows, l2l_dsz,
                 mpole_tables, weights):
            resp_mask = resp_mask[0]
            e1, e2, e3, e4 = e1[0], e2[0], e3[0], e4[0]
            e2_gs = e2_gs[0]
            l2l_rows, l2l_dsz = l2l_rows[0], l2l_dsz[0]

            # P2M + M2M from responsible sources only; every rank's
            # partial multipole tree covers its responsible+ancestor
            # chain (disjoint contributions across ranks)
            w_mine = jnp.where(resp_mask[box_of_src], weights, 0)
            mp = wrangler.form_multipoles(None, None, (w_mine,))
            mp = wrangler.coarsen_multipoles(None, None, mp)

            mp = exchange_mpoles(mp, mpole_tables)

            # per-rank edge slices drive the kernel stages
            pot = wrangler.eval_direct_edges(
                e1[:, 0], e1[:, 1], None, weights)
            pot = pot + wrangler.eval_multipoles_edges(
                e3[:, 0], e3[:, 1], None, mp)

            loc = wrangler.multipole_to_local_edges(
                e2[:, 0], e2[:, 1], e2_gs, mp)
            loc = loc + wrangler.form_locals_edges(
                e4[:, 0], e4[:, 1], None, weights)

            # downward pass along this rank's responsible+ancestor chain
            loc = wrangler.refine_locals_rows_grouped(
                l2l_rows, l2l_dsz, l2l_slices, loc)

            pot = pot + wrangler.eval_locals(None, None, loc)
            pot = jnp.where(resp_mask[pot_box_map], pot, 0)
            return jax.lax.psum(pot, axis)

        try:
            from jax import shard_map
        except ImportError:               # older jax
            from jax.experimental.shard_map import shard_map
        table_specs = tuple(
            (P(axis, None), P(axis, None)) for _ in self._mpole_tables)
        # check_vma off: the wrangler's lax.scan carries start replicated
        # and become device-varying, which the static vma check rejects
        return jax.jit(shard_map(
            step, mesh=self.mesh,
            in_specs=(P(axis, None), P(axis, None, None),
                      P(axis, None, None), P(axis, None),
                      P(axis, None, None), P(axis, None, None),
                      P(axis, None), P(axis, None, None),
                      table_specs, P()),
            out_specs=P(), check_vma=False))

    def _build_step_local(self):
        """SPMD step over per-rank LOCAL particle blocks: each device
        holds only the source/target blocks of its partition (plus the
        replicated box skeleton), so particle memory scales ~1/nranks —
        the evaluation semantics of the reference's local trees
        (``boxtree/distributed/local_tree.py:198-495`` +
        ``local_traversal.py:34-62``)."""
        tree = self.tree
        axis = self.axis_name
        wrangler = self.wrangler
        ntargets = tree.ntargets
        exchange_mpoles = self._make_mpole_exchange()

        l2l_slices = self._l2l_level_slices
        has_dip = wrangler.dipole_vec is not None

        def step(e1, e2, e2_gs, e3, e4, l2l_rows, l2l_dsz,
                 src_pts, src_pm, src_p2m_boxes, src_dip,
                 tgt_boxes, tgt_pts, tgt_pm, tgt_idx,
                 mpole_tables, q_blocks):
            e1, e2, e3, e4 = e1[0], e2[0], e3[0], e4[0]
            e2_gs = e2_gs[0]
            l2l_rows, l2l_dsz = l2l_rows[0], l2l_dsz[0]
            src_pts, src_pm = src_pts[0], src_pm[0]
            src_p2m_boxes = src_p2m_boxes[0]
            tgt_boxes, tgt_pts = tgt_boxes[0], tgt_pts[0]
            tgt_pm, tgt_idx = tgt_pm[0], tgt_idx[0]
            q_blocks = q_blocks[0]
            dip = src_dip[0] if has_dip else None

            # upward pass: P2M from this rank's responsible blocks,
            # M2M along the (replicated) box skeleton, then exchange
            mp = wrangler.form_multipoles_blocks(
                src_p2m_boxes, src_pts, src_pm, q_blocks,
                dip_blocks=dip)
            mp = wrangler.coarsen_multipoles(None, None, mp)
            mp = exchange_mpoles(mp, mpole_tables)

            # near/far stages over local-row edge slices
            pot_b = wrangler.eval_direct_blocks(
                e1[:, 0], e1[:, 1], None, tgt_pts, src_pts, src_pm,
                q_blocks, dip_blocks=dip)
            pot_b = pot_b + wrangler.eval_multipoles_blocks(
                e3[:, 0], e3[:, 1], None, tgt_pts, mp)

            loc = wrangler.multipole_to_local_edges(
                e2[:, 0], e2[:, 1], e2_gs, mp)
            loc = loc + wrangler.form_locals_blocks(
                e4[:, 0], e4[:, 1], None, src_pts, src_pm, q_blocks,
                dip_blocks=dip)
            loc = wrangler.refine_locals_rows_grouped(
                l2l_rows, l2l_dsz, l2l_slices, loc)

            pot_b = pot_b[:tgt_pts.shape[0]] \
                + wrangler.eval_locals_blocks(tgt_boxes, tgt_pts,
                                              tgt_pm, loc)

            # scatter this rank's block potentials to tree target order;
            # responsible boxes partition the targets, so a psum merges
            valid = tgt_pm & (tgt_boxes >= 0)[:, None] & (tgt_idx >= 0)
            safe = jnp.where(valid, tgt_idx.astype(jnp.int64), ntargets)
            pot = jnp.zeros(ntargets, wrangler.dtype).at[safe].add(
                jnp.where(valid, pot_b, 0), mode="drop")
            return jax.lax.psum(pot, axis)

        try:
            from jax import shard_map
        except ImportError:               # older jax
            from jax.experimental.shard_map import shard_map
        table_specs = tuple(
            (P(axis, None), P(axis, None)) for _ in self._mpole_tables)

        def spec(ndim):
            return P(axis, *([None] * (ndim - 1)))

        return jax.jit(shard_map(
            step, mesh=self.mesh,
            in_specs=(spec(3), spec(3), spec(2), spec(3), spec(3),
                      spec(2), spec(3),
                      spec(4), spec(3), spec(2), spec(4),
                      spec(2), spec(4), spec(3), spec(3),
                      table_specs, spec(3)),
            out_specs=P(), check_vma=False))

    # }}}

    def drive_dfmm(self, source_weights):
        """Run the distributed FMM; returns potentials in user target
        order (mirrors ``distributed/__init__.py:301-310``)."""
        w = self.wrangler.reorder_sources(jnp.asarray(source_weights))
        if self.local_particles:
            # ship each rank only its local weight blocks (the analogue
            # of the reference's per-rank ``distribute_source_weights``,
            # ``boxtree/distributed/calculation.py:57-94``)
            wn = np.asarray(w)
            idx, pm = self._local_src_index, self._local_src_pmask
            q = np.where(pm & (idx >= 0), wn[np.clip(idx, 0, None)],
                         0).astype(self.wrangler.dtype)
            lc = self._local
            pot = self._step(
                self.e1_local, self.e2, self.e2_group_sizes,
                self.e3_local, self.e4_local, self.l2l_rows,
                self.l2l_digit_sizes,
                lc["src_points"], lc["src_pmask"], lc["src_p2m_boxes"],
                lc["src_dip"],
                lc["tgt_boxes"], lc["tgt_points"], lc["tgt_pmask"],
                lc["tgt_index"], self._mpole_tables, self._shard(q))
        else:
            pot = self._step(self.resp_masks, self.e1, self.e2,
                             self.e2_group_sizes, self.e3, self.e4,
                             self.l2l_rows, self.l2l_digit_sizes,
                             self._mpole_tables, w)
        pot = self.wrangler.reorder_potentials(pot)
        return self.wrangler.finalize_potentials(pot)
