"""Sharded tree-build phase A: leaf-level assignment over a device mesh.

Second building block of the sharded tree build (doc/PERF.md design
note, after the distributed Morton sort in
:mod:`boxtree_tpu.parallel.shard_sort`).  Single-device phase A
(``tree/build.py::_phase_a``) is a bounded level loop of segmented
scans over the Morton-sorted particles; here each device runs the same
scans over its contiguous sorted shard and the only cross-device work
per level is O(nranks):

1. one ``ppermute`` of each shard's last key prefix, so a shard knows
   whether its first particle starts a new box or continues the left
   neighbor's (the reference instead owns this implicitly — every MPI
   rank rebuilds the tree from its full local particle set,
   ``boxtree/distributed/local_tree.py:198-495``);
2. one ``all_gather`` of each shard's (head segment total, tail segment
   total, first prefix, last prefix) summary, from which every shard
   reconstructs the *global* weight of its boundary-spanning boxes: a
   box spanning shards ``a..b`` weighs ``tail(a) + sum(whole shards
   in between) + head(b)``, and a shard strictly inside the span is a
   single segment whose head == tail == its whole weight;
3. one ``psum`` of the per-level non-empty-box count.

The split rule is the reference's exactly (split iff cumulative refine
weight > max, ``boxtree/tree_build_kernels.py:577-611``), so the
sharded leaf levels and per-level box counts agree bitwise with the
single-device ``_phase_a`` — which is the oracle in
``tests/test_shard_build.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from boxtree_tpu import config
from boxtree_tpu.ops import morton
from boxtree_tpu.tree.build import _seg_totals


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:                                 # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map(fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs)


def _chain_seg_quantities(pfx, left_pfx, vals, *, axis, nranks):
    """Per-position GLOBAL totals of each row of *vals* (Q, per) over
    equal-*pfx* segments of the shard-sorted keys, with the
    spanning-segment chain fix-up across shard boundaries (one
    ``all_gather`` of O(Q) scalars per shard).  *left_pfx* is the left
    neighbor's last prefix (any negative sentinel on rank 0).

    Returns ``(is_start, globs)`` — the segment-start mask (position 0
    compares against *left_pfx*, so a start is global) and the (Q, per)
    per-position global segment totals.  Shared by the sharded
    leaf-level split rule, the box-skeleton counts and the level-
    restriction sweep."""
    per = pfx.shape[0]
    nq = vals.shape[0]
    rank = lax.axis_index(axis).astype(jnp.int64)
    is_start = jnp.concatenate(
        [(pfx[:1] != left_pfx), pfx[1:] != pfx[:-1]])
    # local per-segment totals (scan-only), per quantity
    cums = jnp.cumsum(vals, axis=1)
    locs = jnp.stack([
        _seg_totals(cums[q], vals[q], is_start, cums[q, -1])
        for q in range(nq)])

    # boundary fix-up from gathered shard summaries
    first_start = jnp.argmax(is_start)          # 0 if none
    any_start = is_start.any()
    head_end = jnp.where(any_start, first_start, per)
    head_sum = jnp.where(jnp.arange(per)[None] < head_end,
                         vals, 0).sum(axis=1)   # (Q,)
    last_start = (per - 1
                  - jnp.argmax(is_start[::-1])) * any_start
    tail_sum = jnp.where(jnp.arange(per)[None] >= last_start,
                         vals, 0).sum(axis=1)
    summ = jnp.concatenate([
        jnp.stack([pfx[0], pfx[-1],
                   any_start.astype(jnp.int64)]),
        head_sum, tail_sum, cums[:, -1]])
    summs = lax.all_gather(summ, axis)       # (nranks, 3+3Q)
    g_first, g_last = summs[:, 0], summs[:, 1]
    g_any = summs[:, 2]
    g_head = summs[:, 3:3 + nq]              # (nranks, Q)
    g_tail = summs[:, 3 + nq:3 + 2 * nq]
    g_tot = summs[:, 3 + 2 * nq:3 + 3 * nq]

    # the global weight of the segment CONTAINING each shard
    # boundary: for my tail segment (prefix pfx[-1]) the total
    # is my tail_sum + every following shard's contribution
    # while its first prefix still equals mine (whole shard if
    # it has no internal start, else just its head).
    ranks = jnp.arange(nranks, dtype=jnp.int64)

    def spanning_total(p, r):
        """(Q,) global totals of the segment with prefix *p*
        that touches the boundary of shard *r* (vectorized over
        the gathered summaries; nranks is small).

        Contribution of shards right of r: walk via cumulative
        "chain unbroken" flags — shard q (> r) contributes its
        head if g_first[q] == p and every shard between r and q
        is a single-segment shard with that same prefix."""
        after = ranks > r
        link = (g_first == p) & (g_any == 0)    # whole shard in p
        # chain[q] = all shards in (r, q) are full-p shards
        brk = after & ~link
        chain = jnp.cumsum(brk.astype(jnp.int64)) \
            - jnp.where(brk, 1, 0)
        chain_ok = after & (g_first == p) & (chain == 0)
        right_sum = jnp.where(
            chain_ok[:, None],
            jnp.where((g_any == 1)[:, None], g_head, g_tot),
            0).sum(axis=0)
        # contribution of shards left of r, symmetric
        before = ranks < r
        brk_l = before & ~link
        chain_l = (jnp.cumsum(brk_l[::-1].astype(jnp.int64))
                   - jnp.where(brk_l[::-1], 1, 0))[::-1]
        chain_ok_l = before & (g_last == p) & (chain_l == 0)
        left_sum = jnp.where(
            chain_ok_l[:, None],
            jnp.where((g_any == 1)[:, None], g_tail, g_tot),
            0).sum(axis=0)
        return left_sum + right_sum

    my_tail_total = tail_sum + spanning_total(pfx[-1], rank)
    my_head_total = head_sum + spanning_total(pfx[0], rank)

    in_head = (jnp.arange(per) < head_end)[None]
    in_tail = (jnp.arange(per) >= last_start)[None]
    # single-segment shard: head == tail == the whole span
    single = ~any_start
    globs = jnp.where(
        single, my_tail_total[:, None],
        jnp.where(in_tail, my_tail_total[:, None],
                  jnp.where(in_head, my_head_total[:, None],
                            locs)))

    # a start is GLOBAL iff it is a local is_start (position 0
    # already compares against the left neighbor)
    return is_start, globs


def sharded_morton_codes(coords, mesh, *, depth=None, radii=None):
    """Per-shard full-depth Morton codes with the single-device bbox
    conventions — the front end of the sharded build pipeline.

    The global bounding box is two ``psum``-style reductions (local
    min/max + ``all_gather`` and a local reduce); float min/max is exact,
    so the box — and therefore every code — is bitwise equal to the
    single-device ``_phase_a`` (``tree/build.py``: device min/max,
    squarify, ``ROOT_EXTENT_STRETCH_FACTOR`` stretch, mirroring
    ``boxtree/tree_build.py:456-510``).

    :arg coords: (dimensions, n) float array, n divisible by the mesh
        size; sharded (or shardable) along the particle axis.
    :arg radii: optional (n,) per-particle radii — the bbox then spans
        coords ± radii (extent trees, ``boxtree/tree_build.py:456``).
    :returns: ``(codes, bbox_min, root_extent)`` — (n,) int64 codes
        sharded over the mesh, and the host-replicated bbox.
    """
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    dims, n = coords.shape
    if n % nranks:
        raise ValueError(f"n={n} not divisible by nranks={nranks}")
    if depth is None:
        depth = config.max_morton_depth(dims)
    with_r = radii is not None

    def step(block, rad=None):
        block = block[0]                               # (dims, per)
        r = rad[0] if with_r else 0
        # min/max all-reduce as all_gather + local reduce: the real TPU
        # backend lowers only Sum all-reduces ("Supported lowering only
        # of Sum all reduce", measured r4 via scripts/mesh_scaling_table
        # .py), so pmin/pmax must not appear on the wire.  float min/max
        # stays exact either way, keeping the bbox bitwise equal to the
        # single-device build.
        lo = jnp.min(lax.all_gather(jnp.min(block - r, axis=1), axis),
                     axis=0)
        hi = jnp.max(lax.all_gather(jnp.max(block + r, axis=1), axis),
                     axis=0)
        root_extent = (jnp.max(hi - lo)
                       * (1 + config.ROOT_EXTENT_STRETCH_FACTOR))
        codes = morton.encode_points(block, lo, root_extent, depth)
        return codes[None], lo[None], root_extent[None, None]

    coords_sh = jax.device_put(
        jnp.asarray(coords).reshape(dims, nranks, -1).swapaxes(0, 1),
        NamedSharding(mesh, P(axis, None, None)))
    args = [coords_sh]
    if with_r:
        args.append(jax.device_put(
            jnp.asarray(radii).reshape(nranks, -1),
            NamedSharding(mesh, P(axis, None))))
    codes, lo, ext = jax.jit(_shard_map(
        step, mesh,
        (P(axis, None, None),) + ((P(axis, None),) if with_r else ()),
        (P(axis, None), P(axis, None), P(axis, None))))(*args)
    return (codes.reshape(-1), np.asarray(lo[0]),
            float(np.asarray(ext[0, 0])))


def sharded_leaf_levels(codes_s, weights_s, mesh, *, max_weight,
                        dimensions, depth, adaptive=True, stick_s=None):
    """Leaf-level assignment over shard-sorted Morton keys.

    :arg codes_s: (n,) int64 globally sorted full-depth Morton keys
        (e.g. the output of ``sharded_key_sort``), n divisible by the
        mesh size.
    :arg weights_s: (n,) refine weights in the same order.
    :arg adaptive: with ``False``, every particle gets the same uniform
        leaf level — the first level at which no box is overfull — like
        the single-device non-adaptive kind (the reference splits every
        box while any is overfull,
        ``boxtree/tree_build_kernels.py:580-591``).
    :arg stick_s: optional (n,) int32 per-particle deepest-fitting
        levels (sorted order) for EXTENT trees — the reference's
        per-particle descent stop (``tree_build_kernels.py:388-452``):
        a particle with ``stick <= level`` stays nonchild and stops
        contributing to split decisions.  Requires ``adaptive``.  The
        chain machinery then carries TWO level-masked quantities
        (maskable weights + active counts) instead of one.
    :returns: ``(leaf_level, counts_and_unfit)`` — per-particle leaf
        levels (n,) in sorted order, and the packed per-level non-empty
        box counts + unfit-particle count, matching the single-device
        ``_phase_a`` bitwise.
    """
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    n = codes_s.shape[0]
    if n % nranks:
        raise ValueError(f"n={n} not divisible by nranks={nranks}")
    per = n // nranks
    max_weight = jnp.asarray(max_weight, jnp.int64)
    with_ext = stick_s is not None
    if with_ext and not adaptive:
        raise NotImplementedError(
            "extents require the adaptive kind (like build_tree)")

    def step(codes, w, stick=None):
        codes = codes[0]                                # (per,)
        w = w[0].astype(jnp.int64)
        if with_ext:
            stick = stick[0].astype(jnp.int64)
        rank = lax.axis_index(axis).astype(jnp.int64)

        # left neighbor's last key (device 0 gets a sentinel that can
        # never equal a valid prefix: all-ones)
        left_last = lax.ppermute(
            codes[-1], axis,
            [(i, i + 1) for i in range(nranks - 1)])
        left_last = jnp.where(rank == 0, jnp.int64(-1), left_last)

        cumw = jnp.cumsum(w)
        wtot = cumw[-1]

        def box_quantities(level, vals):
            """Per-segment GLOBAL totals of each row of *vals* (Q, per)
            (the spanning-box chain fix-up, vectorized over Q) plus the
            segment-start mask."""
            shift = jnp.int64(dimensions) * (jnp.int64(depth) - level)
            pfx = codes >> shift
            left_pfx = jnp.where(left_last < 0, jnp.int64(-1),
                                 left_last >> shift)
            return _chain_seg_quantities(pfx, left_pfx, vals,
                                         axis=axis, nranks=nranks)

        def box_weights(level, active=None):
            """(is_start, w_glob[, a_glob]) — the split-rule operands.
            No-extent: one hoisted quantity (all particles count).
            Extent: level-masked weights + active counts, two chained
            quantities (mirrors ``_phase_a``'s with-extent branch)."""
            if not with_ext:
                is_start, globs = box_quantities(level, w[None])
                return is_start, globs[0], None
            wm = jnp.where(active & (stick > level), w, 0)
            am = active.astype(jnp.int64)
            is_start, globs = box_quantities(
                level, jnp.stack([wm, am]))
            return is_start, globs[0], globs[1]

        counts0 = jnp.zeros(depth + 2, jnp.int64)

        if adaptive:
            def cond(state):
                level, n_active, _leaf, _counts = state
                return (level <= depth) & (n_active > 0)

            def body(state):
                level, _n_active, leaf_level, counts = state
                active = leaf_level > depth
                is_start, wg, ag = box_weights(level, active)
                if with_ext:
                    # a box is counted while ANY particle still
                    # descends (mirrors _phase_a's nonempty_start)
                    nonempty = (is_start & (ag > 0)).sum()
                else:
                    # counts only particles still deciding; boxes are
                    # assigned whole (leaf level is a box property), so
                    # active is segment-constant
                    nonempty = (is_start & active).sum()
                nonempty = lax.psum(nonempty.astype(jnp.int64), axis)
                counts = counts.at[level].set(nonempty)
                done = active & (wg <= max_weight)
                if with_ext:
                    done = active & ((wg <= max_weight)
                                     | (stick <= level))
                leaf_level = jnp.where(done, level.astype(jnp.int32),
                                       leaf_level)
                n_act = lax.psum(
                    (leaf_level > depth).sum().astype(jnp.int64), axis)
                return level + 1, n_act, leaf_level, counts

            # the initial leaf_level must be device-VARYING (the loop
            # body writes shard-local values); derive it from the
            # varying codes
            leaf0 = jnp.where(codes < 0, 0, depth + 1).astype(jnp.int32)
            init = (jnp.int64(0), jnp.int64(per * nranks), leaf0, counts0)
            _, _, leaf_level, counts = lax.while_loop(cond, body, init)
            n_unfit = lax.psum((leaf_level > depth).sum(), axis)
            leaf_level = jnp.minimum(leaf_level, depth)
        else:
            # non-adaptive: uniform depth = first level where no box
            # (globally) is overfull, mirroring `_phase_a`'s branch
            def cond(state):
                level, found, _d_used, _counts = state
                return (level <= depth) & ~found

            def body(state):
                level, found, d_used, counts = state
                is_start, wg, _ag = box_weights(level)
                nonempty = lax.psum(
                    is_start.sum().astype(jnp.int64), axis)
                counts = counts.at[level].set(nonempty)
                over = lax.psum(
                    (wg > max_weight).sum().astype(jnp.int64), axis)
                all_ok = over == 0
                d_used = jnp.where(~found & all_ok,
                                   level.astype(jnp.int32), d_used)
                return level + 1, found | all_ok, d_used, counts

            # found / d_used must enter the loop device-VARYING (the
            # body derives them from varying values); build both from
            # the varying codes
            init = (jnp.int64(0),
                    (codes[0] < codes[0]),          # device-varying False
                    jnp.where(codes[0] < codes[0], 0,
                              depth).astype(jnp.int32),
                    counts0)
            _, found, d_used, counts = lax.while_loop(cond, body, init)
            leaf_level = jnp.full(per, 1, jnp.int32) * d_used
            n_unfit = jnp.where(found, 0, per * nranks).astype(jnp.int64)
        return (leaf_level[None],
                jnp.concatenate([counts,
                                 n_unfit.astype(jnp.int64)[None]])[None])

    codes_sh = jax.device_put(codes_s.reshape(nranks, per),
                              NamedSharding(mesh, P(axis, None)))
    w_sh = jax.device_put(
        jnp.asarray(weights_s).reshape(nranks, per),
        NamedSharding(mesh, P(axis, None)))
    args = [codes_sh, w_sh]
    if with_ext:
        args.append(jax.device_put(
            jnp.asarray(stick_s).reshape(nranks, per),
            NamedSharding(mesh, P(axis, None))))
    leaf, counts = jax.jit(_shard_map(
        step, mesh,
        (P(axis, None),) * len(args),
        (P(axis, None), P(axis, None))))(*args)
    return leaf.reshape(-1), np.asarray(counts)[0]



def sharded_restrict_leaf_levels(codes_s, leaf_level, mesh, *,
                                 dimensions, depth, max_level):
    """2:1 level restriction for the sharded build, SPMD over the mesh.

    The 2:1 closure is the UNIQUE minimal refinement of the input leaf
    assignment in which touching non-empty leaves differ by at most one
    level, reached by any schedule of monotone raises each implied by
    the closure — so the sharded pass may apply raises in a different
    order than the single-device fixpoint
    (:func:`boxtree_tpu.tree.level_restrict.restrict_leaf_levels`) and
    still produce the identical tree (the oracle in
    ``tests/test_shard_build.py``).

    Per-shard decomposition of the reference's per-level force-split
    sweep (``boxtree/tree_build_kernels.py:825-915``):

    - *Demand pass*: each shard computes the 3^d parent-level demand
      cells of its own level-``m`` leaves.  A demand whose key interval
      lies strictly inside the shard (``0 < lo`` and ``hi < per``) is
      applied locally — its covered particles AND the gap-adjacent
      particles of an empty demanded cell are all local.  The rest
      (touching or crossing a shard boundary: O(surface), not
      O(volume)) are compacted by one key sort and ``all_gather``-ed;
      EVERY shard then applies each gathered demand against its local
      keys, which together covers all spanning intervals, whole-shard
      coverage, and both gap neighbors of a boundary-straddling empty
      cell without any position routing.  Overflowing the gather
      capacity returns not-ok and the driver retries bigger (the
      applied subset keeps the state valid — raises are monotone).
    - *Consistency sweep* (a box splits as a whole): per level, the
      global any-deeper-particle flag of each equal-prefix segment via
      :func:`_chain_seg_quantities` (the same O(nranks) chain fix-up as
      the split rule).

    Per-device memory stays O(n / nranks + nranks * gcap)."""
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    n = codes_s.shape[0]
    d = dimensions
    if nranks == 1 or n % nranks or max_level < 2:
        from boxtree_tpu.tree.level_restrict import restrict_leaf_levels
        return restrict_leaf_levels(
            codes_s, leaf_level, dimensions=d, depth=depth,
            max_level=max_level)
    per = n // nranks
    from boxtree_tpu.traversal.build import _offsets
    offs_np = _offsets(d, 1)                     # (3^d, d), incl. zero
    noffs = offs_np.shape[0]
    _BIG = jnp.int64(1) << jnp.int64(62)

    def make_pass(gcap):
        offs = jnp.asarray(offs_np)

        def apply_demands(codes, leaf, q, valid, m, lo=None, hi=None):
            """Raise *leaf* for the demands (q, valid) of level *m*:
            cover the demanded parent cells' key ranges to m-1, and
            split the coarser leaf containing an empty demanded cell by
            one level (``level_restrict._restrict_pass`` lines 54-90,
            batched: all reads use the pre-update leaf; the extra
            same-round raises are still implied by the closure)."""
            pshift = jnp.int64(d * (depth - (m - 1)))
            if lo is None:
                lo = jnp.searchsorted(codes, q << pshift)
                hi = jnp.searchsorted(codes,
                                      (q + jnp.int64(1)) << pshift)
            marks = jnp.zeros(per + 1, jnp.int32)
            marks = marks.at[jnp.where(valid, lo, per + 0 * lo)].add(
                1, mode="drop")
            marks = marks.at[jnp.where(valid, hi, per + 0 * hi)].add(
                -1, mode="drop")
            covered = jnp.cumsum(marks[:-1]) > 0
            leaf_new = jnp.where(covered & (leaf < m - 1),
                                 jnp.int32(m - 1), leaf)

            empty = valid & (lo == hi)
            for cand in (lo - 1, lo):
                ok = empty & (cand >= 0) & (cand < per)
                pc = jnp.clip(cand, 0, per - 1)
                t_p = leaf[pc].astype(jnp.int64)
                q_anc = q >> (jnp.int64(d) * (jnp.int64(m - 1) - t_p))
                p_pfx = codes[pc] >> (jnp.int64(d)
                                      * (jnp.int64(depth) - t_p))
                contains = (t_p <= m - 2) & (q_anc == p_pfx)
                upd = ok & contains
                leaf_new = leaf_new.at[
                    jnp.where(upd, pc, per)].max(
                        (t_p + 1).astype(leaf.dtype), mode="drop")
            return leaf_new

        def step(codes, leaf):
            codes = codes[0]
            leaf = leaf[0].astype(jnp.int32)
            rank = lax.axis_index(axis).astype(jnp.int64)
            left_last = lax.ppermute(
                codes[-1], axis, [(i, i + 1) for i in range(nranks - 1)])
            left_last = jnp.where(rank == 0, jnp.int64(-1), left_last)
            leaf_in = leaf
            ok = jnp.bool_(True)

            # {{{ demand pass, deepest level first

            for m in range(max_level, 1, -1):
                shift = jnp.int64(d * (depth - m))
                is_m_leaf = leaf == m
                cells = morton.deinterleave(codes >> shift, d)
                nb = jnp.int64(1) << jnp.int64(m)
                pshift = jnp.int64(d * (depth - (m - 1)))

                qs, vs = [], []
                for i in range(noffs):
                    nc = cells + offs[i][:, None]
                    in_range = ((nc >= 0) & (nc < nb)).all(axis=0)
                    qs.append(morton.interleave(
                        jnp.clip(nc, 0, nb - 1) >> jnp.int64(1)))
                    vs.append(is_m_leaf & in_range)
                q = jnp.stack(qs).ravel()               # (3^d * per,)
                v = jnp.stack(vs).ravel()

                lo = jnp.searchsorted(codes, q << pshift)
                hi = jnp.searchsorted(
                    codes, (q + jnp.int64(1)) << pshift)
                interior = (lo > 0) & (hi < per)

                leaf = apply_demands(codes, leaf, q, v & interior, m,
                                     lo=lo, hi=hi)

                # escalate boundary-touching demands: compact by ONE
                # key sort, gather, apply everywhere
                esc = v & ~interior
                ok &= esc.sum() <= gcap
                esc_q = lax.sort(jnp.where(esc, q, _BIG))[:gcap]
                gq = lax.all_gather(esc_q, axis).reshape(-1)
                leaf = apply_demands(codes, leaf, gq, gq < _BIG, m)

            # }}}

            # {{{ consistency sweep: a box splits as a whole.  Plain
            # equal-prefix segments (no active-run breaks): any raise
            # they add beyond the single-device active-run segments is
            # still implied by the closure (see docstring).

            for t in range(max_level):
                tshift = jnp.int64(d * (depth - t))
                pfx = codes >> tshift
                left_pfx = jnp.where(left_last < 0, jnp.int64(-1),
                                     left_last >> tshift)
                deeper = (leaf > t).astype(jnp.int64)[None]
                _, globs = _chain_seg_quantities(
                    pfx, left_pfx, deeper, axis=axis, nranks=nranks)
                leaf = jnp.where((leaf == t) & (globs[0] > 0),
                                 jnp.int32(t + 1), leaf)

            # }}}

            changed = lax.psum(
                (leaf != leaf_in).any().astype(jnp.int32), axis) > 0
            ok = lax.psum(ok.astype(jnp.int32), axis) == nranks

            # per-level global box counts (single-device
            # ``_recount_boxes`` semantics; the final state is
            # consistent, so active runs equal prefix segments)
            left_leaf = lax.ppermute(
                leaf[-1], axis, [(i, i + 1) for i in range(nranks - 1)])
            left_leaf = jnp.where(rank == 0, jnp.int32(-1), left_leaf)
            counts = jnp.zeros(depth + 2, jnp.int64)
            for level in range(max_level + 1):
                lshift = jnp.int64(d * (depth - level))
                pfx = codes >> lshift
                left_pfx = jnp.where(left_last < 0, jnp.int64(-1),
                                     left_last >> lshift)
                active = leaf >= level
                prev_active = jnp.concatenate(
                    [(left_leaf >= level)[None], active[:-1]])
                diff = jnp.concatenate(
                    [pfx[:1] != left_pfx, pfx[1:] != pfx[:-1]])
                is_start = active & (diff | ~prev_active)
                counts = counts.at[level].set(is_start.sum())
            counts = lax.psum(counts, axis)

            return (leaf[None], counts[None], changed[None], ok[None])

        return jax.jit(_shard_map(
            step, mesh, (P(axis, None), P(axis, None)),
            (P(axis, None), P(axis, None), P(axis), P(axis))))

    codes_sh = jax.device_put(codes_s.reshape(nranks, per),
                              NamedSharding(mesh, P(axis, None)))
    leaf_sh = jax.device_put(
        jnp.asarray(leaf_level).reshape(nranks, per),
        NamedSharding(mesh, P(axis, None)))

    gcap = 2048
    pass_fn = make_pass(gcap)
    rounds = 0
    while True:
        leaf_sh, counts, changed, oks = pass_fn(codes_sh, leaf_sh)
        if not bool(np.asarray(oks).all()):
            gcap = min(4 * gcap, noffs * per)
            pass_fn = make_pass(gcap)
            continue
        rounds += 1
        if not bool(np.asarray(changed).any()):
            break
        if rounds > 4 * (max_level + 2):       # can't happen: raises
            raise RuntimeError(                # are monotone + bounded
                "level restriction failed to converge")
    return (leaf_sh.reshape(-1).astype(jnp.int32),
            np.asarray(counts)[0])


def sharded_box_skeleton(codes_s, leaf_level, counts, mesh, *,
                         dimensions, depth, is_src_s=None,
                         with_extents=False):
    """Per-shard phase B box skeleton: each device materializes the box
    arrays for the boxes whose FIRST particle lies in its shard, with
    only O(nranks * nlevels) cross-device data.

    Third building block of the sharded tree build (after the
    distributed Morton sort and :func:`sharded_leaf_levels`).  The
    single-device ``_phase_b`` (``tree/build.py``) numbers boxes
    level-major and by first-particle order within a level; here each
    shard computes, for ITS boxes,

    - the global box id (local segment-start count + an exclusive scan
      of per-shard start counts — one tiny ``all_gather`` per level),
    - Morton prefix, level, global first-particle index, cumulative
      particle count (a shard's LAST box may continue into following
      shards; their continuation-run head counts are folded in via the
      same chain-of-summaries trick as :func:`sharded_leaf_levels`),
    - the parent's global box id: the global count of level-(l-1)
      segment starts at or before the representative, which is the
      local inclusive cumsum plus the shard's start-count offset —
      valid even when the parent starts in an earlier shard,
    - child links: a child whose parent starts in an earlier shard
      (possible only for the single level-(l-1) box spanning my left
      boundary, so at most ``2^d`` children per shard per level) is
      shipped home via one small ``all_gather``.

    No-extents trees only (like :func:`sharded_leaf_levels`).

    :arg counts: host (depth + 2,) packed per-level box counts from
        :func:`sharded_leaf_levels`.
    :arg is_src_s: optional sharded (n,) bool — "merged particle is a
        source" flags in sorted order (separate-target trees, the
        analogue of the reference's srcntgt merge,
        ``boxtree/tree_build.py:324-403``).  When given, the chain
        machinery carries a SECOND quantity (source counts) and the
        output gains ``box_src_cumul`` (sources in each box's subtree)
        and ``box_src_before`` (global sources before the box's first
        particle — the source-starts prefix).
    :returns: dict of per-shard arrays (leading axis = rank, rows
        padded to a uniform capacity): ``box_id`` (global id, -1 pad),
        ``box_morton``, ``box_level``, ``box_start`` (global
        first-particle index), ``box_count_cumul``, ``box_parent``
        (global id, -1 for root), ``box_child`` ((nranks, cap, 2^d)
        global ids, -1 where absent), and ``nboxes`` (per-shard valid
        counts).
    """
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    n = codes_s.shape[0]
    if n % nranks:
        raise ValueError(f"n={n} not divisible by nranks={nranks}")
    per = n // nranks
    nchild = 2 ** dimensions
    counts = np.asarray(counts)[:-1]
    nlevels = (int(np.max(np.nonzero(counts)[0])) + 1
               if counts.any() else 1)
    level_starts = np.concatenate(
        [[0], np.cumsum(counts[:nlevels])]).astype(np.int64)
    # capacity: a level's box starts are distinct particles, so a shard
    # owns at most min(per, counts[lev]) boxes per level (NOT one box
    # per particle overall: one particle can start a whole nested
    # ancestor chain — non-adaptive trees hit ~nlevels boxes/particle);
    # plus one boundary spillover per level
    cap = int(min(level_starts[-1],
                  sum(int(min(per, counts[lev]))
                      for lev in range(nlevels)) + nlevels))
    iota = np.arange(cap)

    with_src = is_src_s is not None
    with_ext = bool(with_extents)

    def step(codes, leaf, is_src=None):
        codes = codes[0]
        leaf = leaf[0].astype(jnp.int32)
        rank = lax.axis_index(axis).astype(jnp.int64)
        base = rank * per                                # global offset
        if with_src:
            is_src = is_src[0]
            # global exclusive source prefix at local positions: one
            # all_gather of per-shard totals (level-independent)
            src_excl = jnp.concatenate(
                [jnp.zeros(1, jnp.int64),
                 jnp.cumsum(is_src.astype(jnp.int64))])
            src_tot = lax.all_gather(src_excl[-1], axis)
            src_off = (jnp.cumsum(src_tot) - src_tot)[rank]

        left_code = lax.ppermute(
            codes[-1], axis, [(i, i + 1) for i in range(nranks - 1)])
        left_leaf = lax.ppermute(
            leaf[-1], axis, [(i, i + 1) for i in range(nranks - 1)])
        no_left = rank == 0

        box_id = jnp.full(cap, -1, jnp.int64)
        box_morton = jnp.zeros(cap, jnp.int64)
        box_level = jnp.zeros(cap, jnp.int32)
        box_start = jnp.zeros(cap, jnp.int64)
        box_cumul = jnp.zeros(cap, jnp.int64)
        box_src_cumul = jnp.zeros(cap, jnp.int64)
        box_src_before = jnp.zeros(cap, jnp.int64)
        box_deeper = jnp.zeros(cap, jnp.int64)
        box_deeper_src = jnp.zeros(cap, jnp.int64)
        box_parent = jnp.full(cap, -1, jnp.int64)
        box_child = jnp.full((cap, nchild), -1, jnp.int64)
        nmine = jnp.int64(0)

        # previous level's state, for parent links
        prev_cumstart = jnp.zeros(per, jnp.int64)
        prev_offset = jnp.int64(0)
        prev_lstart = jnp.int64(0)
        prev_rowbase = jnp.int64(0)
        prev_nlocal = jnp.int64(0)

        rowidx = jnp.asarray(iota, jnp.int64)

        for level in range(nlevels):
            b0 = int(level_starts[level])
            if level_starts[level + 1] == b0:
                continue
            shift = jnp.int64(dimensions * (depth - level))
            pfx = codes >> shift
            active = leaf >= level
            lpfx = jnp.where(no_left, jnp.int64(-1), left_code >> shift)
            lact = jnp.where(no_left, False, left_leaf >= level)
            prev_act = jnp.concatenate([lact[None], active[:-1]])
            diff = jnp.concatenate(
                [(pfx[:1] != lpfx), pfx[1:] != pfx[:-1]])
            is_start = active & (diff | ~prev_act)

            cumstart = jnp.cumsum(is_start.astype(jnp.int64))
            nlocal = cumstart[-1]
            all_counts = lax.all_gather(nlocal, axis)    # (nranks,)
            offset = (jnp.cumsum(all_counts) - all_counts)[rank]

            # k-th local start position (k = 0..cap-1); >= per if absent
            reps = jnp.searchsorted(
                cumstart, rowidx + 1, side="left")
            mine = rowidx < nlocal
            reps_c = jnp.clip(reps, 0, per - 1)

            # cumulative per-box counts of every tracked QUANTITY
            # (actives; plus active sources for separate-target trees;
            # plus still-descending "deeper" particles — per kind — for
            # extent trees, whose complement is the nonchild count):
            # one chain, vectorized over quantities.  The last local
            # box may continue into following shards.
            quants = [active]
            if with_src:
                quants.append(active & is_src)
            if with_ext:
                deeper_m = active & (leaf > level)
                quants.append(deeper_m)
                if with_src:
                    quants.append(deeper_m & is_src)
            qv = jnp.stack(quants).astype(jnp.int64)     # (Q, per)
            cum0 = jnp.concatenate(
                [jnp.zeros((qv.shape[0], 1), jnp.int64),
                 jnp.cumsum(qv, axis=1)], axis=1)        # (Q, per+1)
            nxt = jnp.concatenate(
                [reps_c[1:], jnp.full(1, per, jnp.int64)])
            nxt = jnp.where(rowidx == nlocal - 1, per, nxt)
            nxt_c = jnp.clip(nxt, 0, per)
            cumuls = cum0[:, nxt_c] - cum0[:, reps_c]    # (Q, cap)

            # chain summaries: quantity totals before each shard's
            # first start (= the continuation run of the box spanning
            # its left boundary), its first prefix/active flag,
            # has-any-start
            any_start = is_start.any()
            first_start_pos = jnp.where(any_start, reps_c[0], per)
            fsp_c = jnp.clip(first_start_pos, 0, per)
            heads = cum0[:, fsp_c]                       # (Q,)
            summ = jnp.concatenate([
                jnp.stack([pfx[0], any_start.astype(jnp.int64),
                           active[0].astype(jnp.int64)]),
                heads])
            summs = lax.all_gather(summ, axis)       # (nranks, 3+Q)
            g_first = summs[:, 0]
            g_any, g_factive = summs[:, 1], summs[:, 2]
            g_heads = summs[:, 3:]                   # (nranks, Q)
            ranks_i = jnp.arange(nranks, dtype=jnp.int64)
            after = ranks_i > rank
            brk = after & ((g_any == 1) | (g_first != pfx[-1])
                           | (g_factive == 0))
            chain = jnp.cumsum(brk.astype(jnp.int64)) \
                - jnp.where(brk, 1, 0)
            link_ok = after & (g_first == pfx[-1]) & (g_factive == 1) \
                & (chain == 0)
            # a start-free linked shard contributes ALL its actives
            # (heads there count them: first_start_pos == per)
            contribs = jnp.where(link_ok[:, None], g_heads,
                                 0).sum(axis=0)          # (Q,)
            cumuls = jnp.where((rowidx == nlocal - 1)[None],
                               cumuls + contribs[:, None], cumuls)
            cumul = cumuls[0]
            qi = 1
            if with_src:
                cumul_src = cumuls[qi]
                qi += 1
            if with_ext:
                deeper = cumuls[qi]
                qi += 1
                if with_src:
                    deeper_src = cumuls[qi]

            gid = b0 + offset + rowidx                   # my global ids
            rows = nmine + rowidx                        # my table rows
            # masked scatters go OUT OF BOUNDS and are dropped (a
            # clipped fallback slot could clobber a real row)
            srows = jnp.where(mine & (rows < cap), rows, cap)

            box_id = box_id.at[srows].set(gid, mode="drop")
            box_morton = box_morton.at[srows].set(pfx[reps_c],
                                                  mode="drop")
            box_level = box_level.at[srows].set(level, mode="drop")
            box_start = box_start.at[srows].set(base + reps_c,
                                                mode="drop")
            box_cumul = box_cumul.at[srows].set(cumul, mode="drop")
            if with_src:
                box_src_cumul = box_src_cumul.at[srows].set(
                    cumul_src, mode="drop")
                box_src_before = box_src_before.at[srows].set(
                    src_off + src_excl[reps_c], mode="drop")
            if with_ext:
                box_deeper = box_deeper.at[srows].set(deeper,
                                                      mode="drop")
                if with_src:
                    box_deeper_src = box_deeper_src.at[srows].set(
                        deeper_src, mode="drop")

            if level > 0:
                # parent global id = level base + (global level-(l-1)
                # start count at-or-before my representative) - 1
                par = (prev_lstart + prev_offset
                       + prev_cumstart[reps_c] - 1)
                box_parent = box_parent.at[srows].set(par, mode="drop")

                # child links into MY parent rows
                digit = (pfx[reps_c] & (nchild - 1)).astype(jnp.int64)
                par_local = prev_cumstart[reps_c] >= 1
                prow = prev_rowbase + prev_cumstart[reps_c] - 1
                ok = mine & par_local & (prow < cap)
                box_child = box_child.at[
                    jnp.where(ok, prow, cap),
                    jnp.where(ok, digit, 0)].set(gid, mode="drop")

                # children whose parent spans my LEFT boundary (starts
                # on an earlier shard): only my first boxes, at most
                # nchild of them.  Ship (gid, parent, digit) triples.
                remote = (mine & ~par_local)[:nchild]
                rbuf = jnp.where(
                    remote[:, None],
                    jnp.stack([gid[:nchild], par[:nchild],
                               digit[:nchild]], axis=1),
                    jnp.int64(-1))
                allr = lax.all_gather(rbuf, axis)  # (nranks, nchild, 3)
                allr = allr.reshape(-1, 3)
                # adopt shipped children whose parent row is mine
                my_lo = prev_lstart + prev_offset
                my_hi = my_lo + prev_nlocal
                c_gid, c_par, c_dig = allr[:, 0], allr[:, 1], allr[:, 2]
                own = (c_gid >= 0) & (c_par >= my_lo) & (c_par < my_hi)
                prow2 = prev_rowbase + (c_par - my_lo)
                box_child = box_child.at[
                    jnp.where(own & (prow2 < cap), prow2, cap),
                    jnp.where(own, c_dig, 0)].set(c_gid, mode="drop")

            prev_cumstart = cumstart
            prev_offset = offset
            prev_lstart = jnp.int64(b0)
            prev_rowbase = nmine
            prev_nlocal = nlocal
            nmine = nmine + nlocal

        outs = (box_id[None], box_morton[None], box_level[None],
                box_start[None], box_cumul[None], box_parent[None],
                box_child[None], nmine[None])
        if with_src:
            outs = outs + (box_src_cumul[None], box_src_before[None])
        if with_ext:
            outs = outs + (box_deeper[None],)
            if with_src:
                outs = outs + (box_deeper_src[None],)
        return outs

    codes_sh = jax.device_put(codes_s.reshape(nranks, per),
                              NamedSharding(mesh, P(axis, None)))
    leaf_sh = jax.device_put(
        jnp.asarray(leaf_level).reshape(nranks, per),
        NamedSharding(mesh, P(axis, None)))
    keys = ("box_id", "box_morton", "box_level", "box_start",
            "box_count_cumul", "box_parent", "box_child", "nboxes")
    nextra = 0
    if with_src:
        keys = keys + ("box_src_cumul", "box_src_before")
        nextra += 2
    if with_ext:
        keys = keys + ("box_deeper",)
        nextra += 1
        if with_src:
            keys = keys + ("box_deeper_src",)
            nextra += 1
    args = [codes_sh, leaf_sh]
    if with_src:
        args.append(jax.device_put(
            jnp.asarray(is_src_s).reshape(nranks, per),
            NamedSharding(mesh, P(axis, None))))
    outs = jax.jit(_shard_map(
        step, mesh, (P(axis, None),) * len(args),
        tuple([P(axis, None)] * 7 + [P(axis)]
              + [P(axis, None)] * nextra)))(*args)
    return dict(zip(keys, outs))


def sharded_build_tree(particles, mesh, *, max_particles_in_box,
                       kind="adaptive", targets=None,
                       source_radii=None, target_radii=None,
                       stick_out_factor=None, extent_norm=None,
                       return_skeleton=False):
    """Build a :class:`boxtree_tpu.Tree` through the sharded pipeline:
    per-shard Morton codes -> distributed key-value sample sort ->
    rebalance -> sharded leaf levels -> per-shard box skeleton, then
    assemble the (small, O(nboxes)) box arrays on the host.

    The result is field-for-field identical to
    :func:`boxtree_tpu.build_tree` (that is the oracle in
    ``tests/test_shard_build.py``): every stage reproduces the
    single-device conventions bitwise.  All three tree *kinds* are
    supported (adaptive, non-adaptive, adaptive-level-restricted — the
    latter via :func:`sharded_restrict_leaf_levels`, see its scaling
    caveat), and so are SEPARATE TARGET trees (``targets=``: the
    srcntgt merge of ``boxtree/tree_build.py:324-403`` — the is-source
    flag rides the sort permutation, and the box skeleton's chain
    machinery carries source counts as a second quantity), and EXTENT
    trees (``source_radii``/``target_radii``: per-shard stick levels
    ride the sort payload, the with-extent split rule runs through the
    vectorized quantity chain of :func:`sharded_leaf_levels`, and a
    second sharded sort re-orders particles by (masked code, leaf
    level) so each box's nonchild particles precede its descendants —
    the invariant of ``boxtree/tree_build_kernels.py:1013-1164``).
    Refine weights beyond ``max_particles_in_box`` are not supported.
    For separate-target trees the per-kind particle reorder maps are
    currently assembled on the host (O(n) host work — the flagship
    sources-are-targets config keeps them sharded).  Particle-sized arrays
    (coordinates, permutations, per-particle leaf boxes) stay sharded
    over the mesh end to end (:func:`..shard_sort.sharded_permute`);
    only the O(nboxes) box arrays are assembled on the host.

    With ``return_skeleton=True``, returns ``(tree, skel)`` where *skel*
    is the per-rank box skeleton dict of :func:`sharded_box_skeleton`
    (the input the sharded-traversal blocks and
    :class:`~boxtree_tpu.parallel.sharded_runner.ShardedFMMRunner`
    consume).
    """
    from boxtree_tpu.parallel.shard_sort import (
        sharded_key_sort, sharded_rebalance)
    from boxtree_tpu.tree.containers import Tree, box_flags_enum

    from boxtree_tpu.tree.build import _TREE_KINDS
    if kind not in _TREE_KINDS:
        raise ValueError(f"unknown tree kind: '{kind}'")
    coords = jnp.asarray(particles)
    dims, nsources = coords.shape
    sources_are_targets = targets is None
    sources_have_extent = source_radii is not None
    targets_have_extent = target_radii is not None
    has_extents = sources_have_extent or targets_have_extent
    if has_extents:
        if targets is None:
            raise ValueError(
                "must specify targets when specifying any kind of radii")
        if kind != "adaptive":
            raise NotImplementedError(
                "extents currently require kind='adaptive'")
        if extent_norm is None:
            extent_norm = "linf"
        if extent_norm not in ("linf", "l2"):
            raise ValueError(f"unexpected extent_norm: {extent_norm}")
    if stick_out_factor is None:
        stick_out_factor = 0.0
    if sources_are_targets:
        merged_pts = coords
        ntargets = nsources
    else:
        tgt_coords = jnp.asarray(targets)
        ntargets = tgt_coords.shape[1]
        merged_pts = jnp.concatenate([coords, tgt_coords], axis=1)
    n = merged_pts.shape[1]
    coord_dtype = merged_pts.dtype
    nranks = mesh.devices.size
    if n % nranks:
        raise ValueError(f"n={n} not divisible by nranks={nranks}"
                         " (pad the input)")
    depth = config.max_morton_depth(dims)

    if has_extents:
        sr = (jnp.asarray(source_radii, coord_dtype)
              if sources_have_extent
              else jnp.zeros(nsources, coord_dtype))
        tr = (jnp.asarray(target_radii, coord_dtype)
              if targets_have_extent
              else jnp.zeros(ntargets, coord_dtype))
        merged_radii = jnp.concatenate([sr, tr])
    else:
        merged_radii = None

    codes, bbox_min, root_extent = sharded_morton_codes(
        merged_pts, mesh, depth=depth, radii=merged_radii)

    # first-sort payload: the original index, with the per-particle
    # stick level (extent descent stop, a purely local computation)
    # packed into spare high bits
    payload = jnp.arange(n, dtype=jnp.int64)
    if has_extents:
        from boxtree_tpu.tree.build import _stick_levels
        (axis_name,) = mesh.axis_names
        bb_dev = jnp.asarray(bbox_min)

        def stick_step(c, r):
            s = _stick_levels(
                c[0], r[0], bb_dev, root_extent, dimensions=dims,
                depth=depth, extent_norm=extent_norm,
                stick_out_factor=float(stick_out_factor))
            return s[None]

        stick = jax.jit(_shard_map(
            stick_step, mesh,
            (P(axis_name, None, None), P(axis_name, None)),
            P(axis_name, None)))(
            jax.device_put(
                merged_pts.reshape(dims, nranks, -1).swapaxes(0, 1),
                NamedSharding(mesh, P(axis_name, None, None))),
            jax.device_put(
                merged_radii.reshape(nranks, -1),
                NamedSharding(mesh, P(axis_name, None)))).reshape(-1)
        payload = payload | (stick.astype(jnp.int64) << jnp.int64(48))

    cf = 2.0
    for _ in range(6):
        merged, mvals, counts, ok = sharded_key_sort(
            codes, mesh, vals=payload, capacity_factor=cf)
        if ok:
            break
        cf *= 2
    else:
        raise RuntimeError("sample sort bucket overflow at "
                           f"capacity_factor={cf}")

    radius = 2
    while True:
        reb = sharded_rebalance(merged, counts, mesh, radius=radius,
                                vals=mvals)
        shards, vshards, ok = reb
        if ok:
            break
        if radius >= nranks:
            raise RuntimeError("rebalance radius exhausted")
        radius = min(2 * radius, nranks)

    codes_s = shards.reshape(-1)
    order = vshards.reshape(-1)
    stick_s = None
    if has_extents:
        stick_s = (order >> jnp.int64(48)).astype(jnp.int32)
        order = order & ((jnp.int64(1) << jnp.int64(48)) - 1)

    leaf_level, counts_and_unfit = sharded_leaf_levels(
        codes_s, jnp.ones(n, jnp.int64), mesh,
        max_weight=max_particles_in_box, dimensions=dims, depth=depth,
        adaptive=(kind != "non-adaptive"), stick_s=stick_s)
    counts_h, n_unfit = counts_and_unfit[:-1], int(counts_and_unfit[-1])
    if n_unfit:
        from boxtree_tpu.tree.build import MaxLevelsExceeded
        raise MaxLevelsExceeded(
            f"{n_unfit} particles remain in overfull boxes at the "
            f"deepest representable level ({depth})")

    if kind == "adaptive-level-restricted":
        leaf_level, counts_h = sharded_restrict_leaf_levels(
            codes_s, leaf_level, mesh, dimensions=dims, depth=depth,
            max_level=int(np.max(np.nonzero(np.asarray(counts_h))[0])))
        counts_and_unfit = np.concatenate([counts_h, [0]])

    if has_extents:
        # re-sort so every box's own (nonchild) particles precede its
        # descendants' ranges: (masked code, leaf level) — the sharded
        # form of ``_phase_b``'s with-extent re-sort
        shift_bits = (jnp.int64(dims)
                      * (jnp.int64(depth) - leaf_level.astype(jnp.int64)))
        masked = (codes_s >> shift_bits) << shift_bits
        cf = 2.0
        for _ in range(6):
            m2, vs2, counts2, ok = sharded_key_sort(
                masked, mesh,
                vals=(leaf_level.astype(jnp.int64), order),
                num_keys=2, capacity_factor=cf)
            if ok:
                break
            cf *= 2
        else:
            raise RuntimeError("extent re-sort bucket overflow at "
                               f"capacity_factor={cf}")
        radius = 2
        while True:
            shards2, v2, ok = sharded_rebalance(
                m2, counts2, mesh, radius=radius, vals=vs2)
            if ok:
                break
            if radius >= nranks:
                raise RuntimeError("rebalance radius exhausted")
            radius = min(2 * radius, nranks)
        codes_s = shards2.reshape(-1)
        leaf_level = v2[0].reshape(-1).astype(jnp.int32)
        order = v2[1].reshape(-1)

    skel = sharded_box_skeleton(
        codes_s, leaf_level, counts_and_unfit, mesh, dimensions=dims,
        depth=depth,
        is_src_s=None if sources_are_targets
        else (order < nsources),
        with_extents=has_extents)

    # host assembly of the box arrays (O(nboxes))
    counts_h = np.asarray(counts_h)
    nlevels = int(np.max(np.nonzero(counts_h)[0])) + 1
    level_starts = np.concatenate(
        [[0], np.cumsum(counts_h[:nlevels])]).astype(np.int64)
    nboxes = int(level_starts[-1])
    nchild = 2 ** dims

    nb = np.asarray(skel["nboxes"])
    ids = np.concatenate(
        [np.asarray(skel["box_id"])[r, :nb[r]] for r in range(nranks)])

    def gathered(key):
        vals = np.concatenate(
            [np.asarray(skel[key])[r, :nb[r]] for r in range(nranks)])
        full = np.empty(vals.shape, vals.dtype)
        full[ids] = vals
        return full

    box_morton = gathered("box_morton")
    box_level = gathered("box_level").astype(config.box_level_dtype)
    box_start = gathered("box_start")
    box_cumul = gathered("box_count_cumul")
    box_parent = gathered("box_parent")
    box_parent[0] = 0                       # root: matches _phase_b
    chv = np.concatenate(
        [np.asarray(skel["box_child"])[r, :nb[r]] for r in range(nranks)])
    box_child = np.empty((nboxes, nchild), np.int64)
    box_child[ids] = chv
    has_children = (box_child >= 0).any(axis=1)
    box_child = np.where(box_child < 0, 0, box_child).T.astype(
        config.box_id_dtype)

    # centers from prefix + level (same formula as _phase_b)
    cells = np.asarray(morton.deinterleave(
        jnp.asarray(box_morton), dims))
    size = np.asarray(root_extent, coord_dtype) \
        / (1 << box_level).astype(coord_dtype)
    box_centers = (np.asarray(bbox_min)[:, None].astype(coord_dtype)
                   + (cells.astype(coord_dtype) + 0.5) * size)

    # nonchild counts: without extents leaf boxes own all their
    # particles and internal boxes none; with extents the "deeper"
    # chain quantity gives each box's still-descending complement
    if has_extents:
        deeper = gathered("box_deeper")
        nonchild = box_cumul - deeper
    else:
        deeper = None
        nonchild = np.where(has_children, 0, box_cumul)
    if sources_are_targets:
        src_cumul = tgt_cumul = box_cumul
        src_before = None
        nonchild_src = nonchild_tgt = nonchild
    else:
        src_cumul = gathered("box_src_cumul")
        src_before = gathered("box_src_before")
        tgt_cumul = box_cumul - src_cumul
        if has_extents:
            deeper_src = gathered("box_deeper_src")
            nonchild_src = src_cumul - deeper_src
            nonchild_tgt = tgt_cumul - (deeper - deeper_src)
        else:
            nonchild_src = np.where(has_children, 0, src_cumul)
            nonchild_tgt = np.where(has_children, 0, tgt_cumul)
    flags = np.where(
        has_children & (src_cumul > nonchild_src),
        box_flags_enum.HAS_SOURCE_CHILD_BOXES, 0).astype(np.int32)
    flags |= np.where(
        has_children & (tgt_cumul > nonchild_tgt),
        box_flags_enum.HAS_TARGET_CHILD_BOXES, 0)
    flags |= np.where(nonchild_src > 0, box_flags_enum.IS_SOURCE_BOX, 0)
    flags |= np.where(nonchild_tgt > 0, box_flags_enum.IS_TARGET_BOX, 0)
    flags |= np.where(~has_children, box_flags_enum.IS_LEAF_BOX, 0)

    # particle-sized arrays stay sharded: one distributed permutation
    # routes the coordinates to sorted order (and yields the inverse
    # permutation = sorted_target_ids), and the per-particle leaf box
    # is a per-shard searchsorted over the (replicated, O(nboxes))
    # leaf starts
    from boxtree_tpu.parallel.shard_sort import sharded_permute
    pid = config.particle_id_dtype
    cf = 2.0
    for _ in range(6):
        src_sh, inv_sh, ok = sharded_permute(
            order, jnp.asarray(merged_pts).T, mesh,
            capacity_factor=cf)
        if ok:
            break
        cf *= 2
    else:
        raise RuntimeError("sharded_permute capacity exhausted at "
                           f"capacity_factor={cf}")
    sorted_target_ids = inv_sh.reshape(-1).astype(pid)
    sources = jnp.swapaxes(src_sh.reshape(n, dims), 0, 1)

    # per-particle owning box: the box whose NONCHILD range contains
    # the particle (without extents that is its leaf; with extents a
    # particle can be nonchild of an internal box).  The nonchild
    # ranges partition [0, n) and, restricted to nonempty ones, their
    # starts strictly increase — one searchsorted per shard.
    leaf_ids = np.flatnonzero(nonchild > 0)
    starts_leaf = box_start[leaf_ids]
    o = np.argsort(starts_leaf)
    leaf_sorted = jnp.asarray(leaf_ids[o].astype(config.box_id_dtype))
    starts_sorted = jnp.asarray(starts_leaf[o])
    per = n // nranks

    def leaf_of(_ids):
        r0 = lax.axis_index(mesh.axis_names[0]).astype(jnp.int64) \
            * np.int64(per)
        i = r0 + jnp.arange(per, dtype=jnp.int64)
        return leaf_sorted[jnp.searchsorted(
            starts_sorted, i, side="right").astype(jnp.int64) - 1][None]

    box_id_of = jax.jit(_shard_map(
        leaf_of, mesh, (P(mesh.axis_names[0], None),),
        P(mesh.axis_names[0], None)))(
        jnp.zeros((nranks, 1), jnp.int32)).reshape(-1)

    if sources_are_targets:
        src_arr = tgt_arr = sources
        user_source_ids = order.reshape(-1).astype(pid)
        box_id_of_src = box_id_of_tgt = box_id_of
        bss, bsc, bsn = box_start, box_cumul, nonchild
        bts, btc, btn = box_start, box_cumul, nonchild
    else:
        # per-kind particle split (host O(n) index work + device
        # gathers; see the docstring note)
        order_h = np.asarray(order.reshape(-1))
        is_src_h = order_h < nsources
        pos_src = np.flatnonzero(is_src_h)
        pos_tgt = np.flatnonzero(~is_src_h)
        src_arr = sources[:, jnp.asarray(pos_src)]
        tgt_arr = sources[:, jnp.asarray(pos_tgt)]
        user_source_ids = jnp.asarray(
            order_h[pos_src].astype(pid))
        user_tgt = order_h[pos_tgt] - nsources
        sti = np.empty(ntargets, np.int64)
        sti[user_tgt] = np.arange(ntargets)
        sorted_target_ids = jnp.asarray(sti.astype(pid))
        box_of_merged = np.asarray(box_id_of)
        box_id_of_src = jnp.asarray(box_of_merged[pos_src])
        box_id_of_tgt = jnp.asarray(box_of_merged[pos_tgt])
        bss, bsc, bsn = src_before, src_cumul, nonchild_src
        bts = box_start - src_before
        btc, btn = tgt_cumul, nonchild_tgt

    src_radii_tree = tgt_radii_tree = None
    sbb_min = sbb_max = tbb_min = tbb_max = None
    if has_extents:
        from boxtree_tpu.tree.build import _box_extents
        sr_h = np.asarray(sr)
        tr_h = np.asarray(tr)
        src_radii_tree = jnp.asarray(
            sr_h[np.asarray(user_source_ids)])
        tgt_radii_tree = jnp.asarray(tr_h[user_tgt])
        centers_dev = jnp.asarray(box_centers)
        parents_dev = jnp.asarray(box_parent.astype(config.box_id_dtype))
        lsb_t = tuple(int(x) for x in level_starts)
        sbb_min, sbb_max = _box_extents(
            src_arr, src_radii_tree if sources_have_extent else None,
            box_id_of_src, centers_dev, parents_dev, lsb=lsb_t)
        tbb_min, tbb_max = _box_extents(
            tgt_arr, tgt_radii_tree if targets_have_extent else None,
            box_id_of_tgt, centers_dev, parents_dev, lsb=lsb_t)

    tree = Tree(
        root_extent=root_extent,
        box_centers=jnp.asarray(box_centers),
        box_parent_ids=jnp.asarray(box_parent.astype(config.box_id_dtype)),
        box_child_ids=jnp.asarray(box_child),
        box_levels=jnp.asarray(box_level),
        box_flags=jnp.asarray(flags),
        box_morton_prefixes=jnp.asarray(box_morton),
        level_start_box_nrs=tuple(int(x) for x in level_starts),
        box_id_dtype=config.box_id_dtype,
        box_level_dtype=config.box_level_dtype,
        coord_dtype=np.dtype(coord_dtype),
        sources_have_extent=sources_have_extent,
        targets_have_extent=targets_have_extent,
        extent_norm=extent_norm if has_extents else None,
        stick_out_factor=float(stick_out_factor),
        _is_pruned=True,
        max_depth=depth,
        sources_are_targets=sources_are_targets,
        particle_id_dtype=pid,
        sources=src_arr,
        source_radii=(src_radii_tree if sources_have_extent
                      else None),
        targets=tgt_arr,
        target_radii=(tgt_radii_tree if targets_have_extent
                      else None),
        user_source_ids=user_source_ids,
        sorted_target_ids=sorted_target_ids,
        box_source_starts=jnp.asarray(bss.astype(pid)),
        box_source_counts_nonchild=jnp.asarray(bsn.astype(pid)),
        box_source_counts_cumul=jnp.asarray(bsc.astype(pid)),
        box_target_starts=jnp.asarray(bts.astype(pid)),
        box_target_counts_nonchild=jnp.asarray(btn.astype(pid)),
        box_target_counts_cumul=jnp.asarray(btc.astype(pid)),
        box_source_bounding_box_min=sbb_min,
        box_source_bounding_box_max=sbb_max,
        box_target_bounding_box_min=tbb_min,
        box_target_bounding_box_max=tbb_max,
        box_id_of_source=box_id_of_src,
        box_id_of_target=box_id_of_tgt,
    )
    return (tree, skel) if return_skeleton else tree


def sharded_neighbor_table(tree, skel, mesh):
    """Per-rank rows of the packed neighbor table
    (:func:`boxtree_tpu.traversal.neighbors.build_neighbor_table`),
    built level-synchronously under ``shard_map``.

    First sharded-traversal building block (doc/PERF.md design note,
    item 4): each device computes the (3^d)-column neighbor rows for
    the boxes it owns (the rows of :func:`sharded_box_skeleton`).  Box
    *metadata* (prefixes, parents, child entries — O(nboxes)) is
    replicated, like the distributed runner's box skeleton and the
    reference's local trees; the table ROWS — the O(nboxes * 3^d) part
    — are sharded.  Per level the only cross-device exchange is one
    ``all_gather`` of each rank's LAST row of the parent level: the
    parent of a rank's first level-``l`` box is the one box that can
    live on another rank (it spans the shard boundary, so it is its
    owner's last level-``l-1`` box).

    :arg tree: the (replicated) single-device-equivalent tree; only
        O(nboxes) fields are read.
    :arg skel: output dict of :func:`sharded_box_skeleton`.
    :returns: (nranks, cap, 3^d) int32 per-rank row blocks aligned
        with ``skel["box_id"]`` (-1 pad rows).
    """
    from boxtree_tpu.traversal.neighbors import (
        ID_MASK, SRC_BIT, TGT_BIT, _offsets1)
    from boxtree_tpu.tree.containers import box_flags_enum as _F

    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    d = tree.dimensions
    offs = _offsets1(d)
    m = offs.shape[0]
    nchild = 2 ** d
    nboxes = tree.nboxes
    nlevels = tree.nlevels
    col_w = 3 ** (d - 1 - np.arange(d))

    tgt_mask = (jnp.asarray(tree.box_flags) & _F.IS_TARGET_BOX) != 0
    iota = jnp.arange(nboxes, dtype=jnp.int32)
    ent = (iota
           | jnp.where((jnp.asarray(tree.box_flags)
                        & _F.IS_SOURCE_BOX) != 0, SRC_BIT, 0)
           | jnp.where(tgt_mask, TGT_BIT, 0)).astype(jnp.int32)
    child_ent = jnp.where(
        jnp.asarray(tree.box_child_ids).T > 0,
        ent[jnp.clip(jnp.asarray(tree.box_child_ids).T, 0).astype(
            jnp.int64)],
        np.int32(-1))                               # (nboxes, 2^d)
    prefixes = jnp.asarray(tree.box_morton_prefixes)
    parents = jnp.asarray(tree.box_parent_ids).astype(jnp.int64)

    # static (child digit, column) -> (parent column, child digit) maps
    pcol = np.zeros((nchild, m), np.int64)
    cdig = np.zeros((nchild, m), np.int64)
    for q in range(nchild):
        qb = np.array([(q >> (d - 1 - a)) & 1 for a in range(d)])
        for j in range(m):
            dp = (qb + offs[j]) >> 1
            pcol[q, j] = ((dp + 1) * col_w).sum()
            cdig[q, j] = (((qb + offs[j]) & 1)
                          << (d - 1 - np.arange(d))).sum()
    pcol_j = jnp.asarray(pcol)
    cdig_j = jnp.asarray(cdig)

    box_id = skel["box_id"]                         # (nranks, cap)
    box_level = skel["box_level"]
    cap = box_id.shape[1]

    def step(bid, blev):
        bid = bid[0].astype(jnp.int64)              # (cap,), -1 pad
        blev = blev[0]
        valid = bid >= 0
        buf = jnp.full((cap, m), -1, jnp.int32)

        # root row (level 0): whichever rank owns box 0
        own_root = valid & (bid == 0)
        buf = jnp.where(own_root[:, None]
                        & (jnp.arange(m) == m // 2)[None, :],
                        ent[0], buf)

        bid_c = jnp.clip(bid, 0)
        par = parents[bid_c]                        # (cap,)
        digit = (prefixes[bid_c] & (nchild - 1)).astype(jnp.int64)

        # local row of each box's parent (box_id ascending across rows)
        plr = jnp.searchsorted(
            jnp.where(valid, bid, jnp.int64(nboxes) + 1), par)
        plr_c = jnp.clip(plr, 0, cap - 1)
        par_local = valid & (bid[plr_c] == par)

        for lev in range(1, nlevels):
            mine = valid & (blev == lev)

            # each rank's LAST level-(lev-1) row + its global id
            is_pl = valid & (blev == lev - 1)
            last = jnp.where(is_pl.any(),
                             (cap - 1) - jnp.argmax(is_pl[::-1]),
                             cap - 1)
            last_id = jnp.where(is_pl.any(), bid[last], jnp.int64(-1))
            g = lax.all_gather(
                jnp.concatenate([last_id[None].astype(jnp.int64),
                                 buf[last].astype(jnp.int64)]),
                axis)                               # (nranks, 1+m)
            halo_ids, halo_rows = g[:, 0], g[:, 1:].astype(jnp.int32)

            pn_local = buf[plr_c]                   # (cap, m)
            hit = halo_ids[None, :] == par[:, None]  # (cap, nranks)
            pn_halo = jnp.einsum(
                "cr,rm->cm", hit.astype(jnp.int32), halo_rows + 1) - 1
            pn = jnp.where(par_local[:, None], pn_local,
                           jnp.where(hit.any(axis=1)[:, None],
                                     pn_halo, np.int32(-1)))

            # CLAMPED recurrence (matches build_neighbor_table, r4):
            # child lookups are meaningful only where the parent-level
            # entry is actually AT the parent level; where the needed
            # child is absent, the parent-level entry itself
            # propagates down (the finest coarser covering box)
            pid = (jnp.clip(pn, 0) & ID_MASK).astype(jnp.int64)
            at_plev = (pn >= 0) & (pid >= np.int64(
                tree.level_start_box_nrs[lev - 1]))
            ch = child_ent[pid]                     # (cap, m, 2^d)
            ch = jnp.where(at_plev[:, :, None], ch, np.int32(-1))
            cols = pcol_j[digit]                    # (cap, m)
            digs = cdig_j[digit]
            rows = jnp.take_along_axis(
                ch.reshape(cap, m * nchild),
                cols * nchild + digs, axis=1)       # (cap, m)
            pn_at_col = jnp.take_along_axis(pn, cols, axis=1)
            rows = jnp.where(rows >= 0, rows, pn_at_col)
            buf = jnp.where(mine[:, None], rows, buf)

        return buf[None]

    spec = NamedSharding(mesh, P(axis, None))
    outs = jax.jit(_shard_map(
        step, mesh, (P(axis, None), P(axis, None)),
        P(axis, None, None)))(
        jax.device_put(box_id, spec), jax.device_put(box_level, spec))
    return outs


def sharded_l1_edges(tree, skel, ntable_rows, mesh):
    """Per-rank List-1 edges over the sharded neighbor table.

    Second sharded-traversal building block (doc/PERF.md design note,
    item 4): each device emits the ``(tgt_box << 32) | src_box`` List-1
    keys for the boxes it owns — the same-level neighbor row plus, per
    cross-level shift ``s``, the <= 2^d coarser-level touching window of
    the single-device fast generators
    (:func:`boxtree_tpu.traversal.neighbors.fgen_list1_tgt` /
    :func:`...fgen_list1_src`) — sorts and compacts them locally
    (:func:`..traversal.build._emit_compact`'s chunk trick, one chunk
    per rank).  The union over ranks equals the single-device
    traversal's List 1 exactly (``tests/test_shard_build.py``).

    The only cross-device exchange is ONE ``all_gather`` of each rank's
    last owned neighbor-table row per level: a window's ancestor row
    that is not locally owned belongs to a box that starts in an
    earlier shard and spans into this one, which makes it precisely its
    owner's LAST box of that level.

    :arg ntable_rows: output of :func:`sharded_neighbor_table`, aligned
        with ``skel["box_id"]``.
    :returns: ``(keys, counts)`` — (nranks, cap * K) int64 per-rank key
        blocks (each rank's valid keys sorted first, ``_INVALID_KEY``
        pad after) and the (nranks,) valid counts.
    """
    from boxtree_tpu.traversal.build import _INVALID_KEY
    from boxtree_tpu.traversal.neighbors import (
        ID_MASK, SRC_BIT, TGT_BIT, _cross_window)

    (axis,) = mesh.axis_names
    d = tree.dimensions
    m = 3 ** d
    nboxes = tree.nboxes
    nlevels = tree.nlevels
    prefixes = jnp.asarray(tree.box_morton_prefixes)
    parents = jnp.asarray(tree.box_parent_ids).astype(jnp.int64)
    col_w = jnp.asarray(3 ** (d - 1 - np.arange(d)), jnp.int64)
    lsb_arr = jnp.asarray(np.asarray(tree.level_start_box_nrs,
                                     np.int64))

    box_id = skel["box_id"]
    box_level = skel["box_level"]
    cap = box_id.shape[1]

    def step(bid, blev, nrows):
        bid = bid[0].astype(jnp.int64)              # (cap,), -1 pad
        blev = blev[0].astype(jnp.int64)
        nrows = nrows[0]                            # (cap, m)
        valid = bid >= 0
        bid_c = jnp.clip(bid, 0)

        # shared cross-shard resolvers (also used by sharded_l3l4_edges)
        anc = _ancestor_table(bid_c, blev, valid, parents,
                              nlevels=nlevels)
        row_of = _halo_row_lookup(bid, blev, valid, nrows,
                                  nboxes=nboxes, nlevels=nlevels,
                                  axis=axis)

        cells = morton.deinterleave(prefixes[bid_c], d)  # (d, cap)
        center = nrows[:, m // 2]
        is_tgt = valid & ((center & TGT_BIT) != 0)
        is_src = valid & ((center & SRC_BIT) != 0)
        tgt_hi = bid_c << np.int64(32)

        keys = []

        def at_level(ent, lev):
            """Exact-level filter for the CLAMPED table rows (r4): an
            entry deeper than a coarser fallback has id >= the level's
            start (ids are level-major; row entries are never deeper
            than the probed level)."""
            return ((ent & ID_MASK).astype(jnp.int64)
                    >= lsb_arr[jnp.clip(lev, 0)][:, None])

        # same-level part: the whole neighbor row touches the box
        ent = nrows
        ok = (is_tgt[:, None] & (ent >= 0) & ((ent & SRC_BIT) != 0)
              & at_level(ent, blev))
        keys.append(jnp.where(
            ok, tgt_hi[:, None] | (ent & ID_MASK).astype(jnp.int64),
            _INVALID_KEY))

        # cross-level windows, one block per level shift
        for s in range(1, nlevels):
            delta, dvalid = _cross_window(cells, s, d)
            col = ((delta + 1) * col_w[:, None, None]).sum(axis=0)
            deep = valid & (blev >= s)
            rows_a = row_of(jnp.where(deep, anc[
                jnp.arange(cap), jnp.clip(blev - s, 0)], -1),
                blev - s)
            ent = jnp.take_along_axis(rows_a, col, axis=1)  # (cap, 2^d)
            lev_ok = at_level(ent, blev - s)

            # target side: I am the (finer) target, window boxes are
            # coarser sources
            ok = (is_tgt[:, None] & deep[:, None] & dvalid & lev_ok
                  & (ent >= 0) & ((ent & SRC_BIT) != 0))
            keys.append(jnp.where(
                ok, tgt_hi[:, None] | (ent & ID_MASK).astype(jnp.int64),
                _INVALID_KEY))

            # source side: I am the (finer) source, window boxes are
            # coarser targets
            ok = (is_src[:, None] & deep[:, None] & dvalid & lev_ok
                  & (ent >= 0) & ((ent & TGT_BIT) != 0))
            keys.append(jnp.where(
                ok, ((ent & ID_MASK).astype(jnp.int64) << np.int64(32))
                | bid_c[:, None], _INVALID_KEY))

        flat = lax.sort(jnp.concatenate(keys, axis=1).reshape(-1))
        count = jnp.searchsorted(flat, _INVALID_KEY).astype(jnp.int64)
        return flat[None], count[None]

    spec = NamedSharding(mesh, P(axis, None))
    keys, counts = jax.jit(_shard_map(
        step, mesh,
        (P(axis, None), P(axis, None), P(axis, None, None)),
        (P(axis, None), P(axis))))(
        jax.device_put(box_id, spec), jax.device_put(box_level, spec),
        jax.device_put(ntable_rows, NamedSharding(mesh, P(axis, None,
                                                          None))))
    return keys, counts


def sharded_l2_edges(tree, skel, ntable_rows, mesh):
    """Per-rank List-2 (sep-siblings / M2L) edges over the sharded
    neighbor table.

    Third sharded-traversal building block (doc/PERF.md design note,
    item 4): each device emits the ``(tgt_box << 32) | src_box`` List-2
    keys for the children of the boxes it owns, from the PARENT side
    with the single-device generator core
    (:func:`boxtree_tpu.traversal.neighbors.list2_from_parent_rows`,
    the analogue of the reference's ``sep_siblings`` pass,
    ``boxtree/traversal.py:554-600``).  Because the parent's neighbor
    row is locally owned and its neighbors' child entries live in the
    replicated O(nboxes) child table, this block needs NO cross-device
    exchange at all.  The union over ranks equals the single-device
    traversal's List 2 exactly (``tests/test_shard_build.py``).

    :arg ntable_rows: output of :func:`sharded_neighbor_table`, aligned
        with ``skel["box_id"]``.
    :returns: ``(keys, counts)`` — (nranks, cap * 2^d * K) int64
        per-rank key blocks (each rank's valid keys sorted first,
        ``_INVALID_KEY`` pad after) and the (nranks,) valid counts.
    """
    from boxtree_tpu.traversal.build import _INVALID_KEY
    from boxtree_tpu.traversal.neighbors import list2_from_parent_rows
    from boxtree_tpu.tree.containers import box_flags_enum as _F

    (axis,) = mesh.axis_names
    d = tree.dimensions
    child_rows = jnp.asarray(tree.box_child_ids).T.astype(jnp.int32)
    flags = jnp.asarray(tree.box_flags)
    is_totp = (flags & (_F.IS_TARGET_BOX
                        | _F.HAS_TARGET_CHILD_BOXES)) != 0

    box_id = skel["box_id"]
    cap = box_id.shape[1]

    box_levels_g = jnp.asarray(tree.box_levels).astype(jnp.int64)
    lsb_arr = jnp.asarray(np.asarray(tree.level_start_box_nrs,
                                     np.int64))

    def step(bid, nrows):
        bid = bid[0].astype(jnp.int64)              # (cap,), -1 pad
        nrows = nrows[0]                            # (cap, 3^d)
        valid = bid >= 0
        pn = jnp.where(valid[:, None], nrows, np.int32(-1))
        own = jnp.where(valid[:, None],
                        child_rows[jnp.clip(bid, 0)], np.int32(0))
        # clamped table rows (r4): filter coarser fallback entries out
        # of the parent row via the per-row level start
        min_id = lsb_arr[box_levels_g[jnp.clip(bid, 0)]]
        cand, own = list2_from_parent_rows(pn, own, child_rows,
                                           dimensions=d, min_id=min_id)
        ok = ((cand >= 0) & (own > 0)[..., None]
              & is_totp[jnp.clip(own, 0).astype(jnp.int64)][..., None])
        keys = jnp.where(
            ok, (own.astype(jnp.int64)[..., None] << np.int64(32))
            | cand.astype(jnp.int64), _INVALID_KEY)
        flat = lax.sort(keys.reshape(-1))
        count = jnp.searchsorted(flat, _INVALID_KEY).astype(jnp.int64)
        return flat[None], count[None]

    spec = NamedSharding(mesh, P(axis, None))
    keys, counts = jax.jit(_shard_map(
        step, mesh, (P(axis, None), P(axis, None, None)),
        (P(axis, None), P(axis))))(
        jax.device_put(box_id, spec),
        jax.device_put(ntable_rows, NamedSharding(mesh, P(axis, None,
                                                          None))))
    return keys, counts


def _halo_row_lookup(bid, blev, valid, nrows, *, nboxes, nlevels, axis):
    """Inside ``shard_map``: the cross-shard neighbor-row resolver.

    Gathers every rank's LAST owned row of every level (one
    ``all_gather`` — the only entry another rank can ever need, because
    a box not owned here but ancestral to an owned box spans the shard
    boundary, making it its owner's last box of its level) and returns
    ``row_of(gids, glev)`` mapping arbitrary global box ids at per-box
    levels to their neighbor-table rows (local when owned, else halo;
    all ``-1`` when absent).  Shared by the sharded edge emitters."""
    cap = bid.shape[0]
    bid_key = jnp.where(valid, bid, jnp.int64(nboxes) + 1)
    halo_parts = []
    for lv in range(nlevels):
        is_l = valid & (blev == lv)
        last = jnp.where(is_l.any(),
                         (cap - 1) - jnp.argmax(is_l[::-1]),
                         cap - 1)
        last_id = jnp.where(is_l.any(), bid[last], jnp.int64(-1))
        halo_parts.append(jnp.concatenate(
            [last_id[None], nrows[last].astype(jnp.int64)]))
    halo = lax.all_gather(jnp.stack(halo_parts), axis)
    halo_ids = halo[:, :, 0].T                  # (nlevels, nranks)
    halo_rows = jnp.swapaxes(
        halo[:, :, 1:].astype(jnp.int32), 0, 1)  # (nlevels, nranks, m)

    def row_of(gids, glev):
        lr = jnp.clip(jnp.searchsorted(bid_key, gids), 0, cap - 1)
        owned = (bid[lr] == gids) & (gids >= 0)
        lv = jnp.clip(glev, 0, nlevels - 1)
        hid = halo_ids[lv]                      # (cap, nranks)
        hrow = halo_rows[lv]                    # (cap, nranks, m)
        hit = (hid == gids[:, None]) & (gids >= 0)[:, None]
        far = jnp.einsum("cr,crm->cm", hit.astype(jnp.int32),
                         hrow + 1).astype(jnp.int32) - 1
        return jnp.where(owned[:, None], nrows[jnp.clip(lr, 0)], far)

    return row_of


def _ancestor_table(bid_c, blev, valid, parents, *, nlevels):
    """``anc[c, l]`` = the level-``l`` ancestor of owned box ``c``
    (-1 above the root or below the box's own level)."""
    cap = bid_c.shape[0]
    anc = jnp.full((cap, nlevels), jnp.int64(-1))
    cur = bid_c
    lev_iota = jnp.arange(nlevels, dtype=jnp.int64)
    for up in range(nlevels):
        onehot = (blev - up)[:, None] == lev_iota[None, :]
        anc = jnp.where(onehot & valid[:, None], cur[:, None], anc)
        cur = parents[cur]
    return anc


def sharded_l3l4_edges(tree, skel, ntable_rows, mesh):
    """Per-rank List-3 (sep-smaller), List-4 (sep-bigger) and slnws
    (same-level non-well-separated / colleague) edges over the sharded
    neighbor table.

    Fourth sharded-traversal building block (doc/PERF.md design note,
    item 4), completing the interaction lists: each device emits, for
    the boxes it owns,

    - ``slnws``: the box's own neighbor row minus the center column
      (purely local — :func:`..traversal.neighbors.fgen_slnws`);
    - List 3 keys ``(tgt << 32) | w`` from the SOURCE side: coarser
      target boxes touching ``parent(w)`` but not ``w`` — the parent's
      full row plus its <= 2^d cross window per deeper ancestor level
      (:func:`..traversal.neighbors.fgen_list3`, the analogue of the
      reference's ``sep_smaller`` pass, ``boxtree/traversal.py``);
    - List 4 keys ``(b << 32) | src``: source boxes among the same
      ancestor windows that touch ``parent(b)`` but not ``b``
      (:func:`..traversal.neighbors.fgen_list4`).

    Lists 3 and 4 read the SAME ancestor rows, so they share one
    enumeration here; the only cross-device exchange is the one
    per-level last-row ``all_gather`` of :func:`_halo_row_lookup`
    (an ancestor row not owned locally spans the shard boundary and is
    its owner's last box of that level).  The union over ranks of each
    list equals the single-device traversal's exactly
    (``tests/test_shard_build.py``).

    :arg ntable_rows: output of :func:`sharded_neighbor_table`, aligned
        with ``skel["box_id"]``.
    :returns: dict with keys ``"slnws"``, ``"l3"``, ``"l4"``, each a
        ``(keys, counts)`` pair — (nranks, lanes) int64 per-rank key
        blocks (valid keys sorted first, ``_INVALID_KEY`` pad after)
        and the (nranks,) valid counts.
    """
    from boxtree_tpu.traversal.build import _INVALID_KEY
    from boxtree_tpu.traversal.neighbors import (
        ID_MASK, SRC_BIT, TGT_BIT, _cross_window, _low_bits, _offsets1,
        _touch_off)
    from boxtree_tpu.tree.containers import box_flags_enum as _F

    (axis,) = mesh.axis_names
    d = tree.dimensions
    m = 3 ** d
    nboxes = tree.nboxes
    nlevels = tree.nlevels
    prefixes = jnp.asarray(tree.box_morton_prefixes)
    parents = jnp.asarray(tree.box_parent_ids).astype(jnp.int64)
    flags = jnp.asarray(tree.box_flags)
    has_src_g = (flags & (_F.IS_SOURCE_BOX
                          | _F.HAS_SOURCE_CHILD_BOXES)) != 0
    is_totp_g = (flags & (_F.IS_TARGET_BOX
                          | _F.HAS_TARGET_CHILD_BOXES)) != 0
    offs = jnp.asarray(_offsets1(d).T)          # (d, m)
    col_w = jnp.asarray(3 ** (d - 1 - np.arange(d)), jnp.int64)
    lsb_arr2 = jnp.asarray(np.asarray(tree.level_start_box_nrs,
                                      np.int64))

    box_id = skel["box_id"]
    box_level = skel["box_level"]
    cap = box_id.shape[1]

    def step(bid, blev, nrows):
        bid = bid[0].astype(jnp.int64)          # (cap,), -1 pad
        blev = blev[0].astype(jnp.int64)
        nrows = nrows[0]                        # (cap, m)
        valid = bid >= 0
        bid_c = jnp.clip(bid, 0)
        row_of = _halo_row_lookup(bid, blev, valid, nrows,
                                  nboxes=nboxes, nlevels=nlevels,
                                  axis=axis)
        anc = _ancestor_table(bid_c, blev, valid, parents,
                              nlevels=nlevels)
        cells = morton.deinterleave(prefixes[bid_c], d)     # (d, cap)
        pcells = cells >> np.int64(1)
        par = parents[bid_c]
        has_src = valid & has_src_g[bid_c]
        is_totp = valid & is_totp_g[bid_c]
        w_lo = bid_c[:, None]
        tgt_hi = bid_c[:, None] << np.int64(32)
        ciota = jnp.arange(cap)

        def pack(keys):
            flat = lax.sort(jnp.concatenate(keys, axis=1).reshape(-1))
            return flat, jnp.searchsorted(
                flat, _INVALID_KEY).astype(jnp.int64)

        # slnws: own row minus the center column, no cross-shard reads
        # (clamped coarser fallback entries filtered by the one
        # level-start compare, like fgen_slnws)
        srow = jnp.where(valid[:, None], nrows, np.int32(-1))
        keep = np.arange(m) != m // 2
        srow = srow[:, keep]
        s_ok = (srow >= 0) & ((srow & ID_MASK).astype(jnp.int64)
                              >= lsb_arr2[jnp.clip(blev, 0)][:, None])
        s_keys, s_count = pack([jnp.where(
            s_ok, tgt_hi | (srow & ID_MASK).astype(jnp.int64),
            _INVALID_KEY)])

        l3_keys, l4_keys = [], []

        def at_level(ent, lev):
            """Exact-level filter for the CLAMPED table rows (r4)."""
            return ((ent & ID_MASK).astype(jnp.int64)
                    >= lsb_arr2[jnp.clip(lev, 0)][:, None])

        # parent's full neighbor row (candidate level = blev - 1);
        # the touch test's level shift is statically 1 for every box
        prow = row_of(jnp.where(valid & (blev >= 1), par, -1),
                      blev - 1)                             # (cap, m)
        plev_ok = at_level(prow, blev - 1)
        touch1 = _touch_off(offs[:, None, :], 0,
                            _low_bits(cells, 1)[:, :, None], 1)
        ok = ((blev >= 1) & has_src)[:, None] & (prow >= 0) \
            & ((prow & TGT_BIT) != 0) & ~touch1 & plev_ok
        l3_keys.append(jnp.where(
            ok, ((prow & ID_MASK).astype(jnp.int64) << np.int64(32))
            | w_lo, _INVALID_KEY))
        ok = ((blev >= 2) & is_totp)[:, None] & (prow >= 0) \
            & ((prow & SRC_BIT) != 0) & ~touch1 & plev_ok
        l4_keys.append(jnp.where(
            ok, tgt_hi | (prow & ID_MASK).astype(jnp.int64),
            _INVALID_KEY))

        # the parent's cross window per deeper ancestor level, one
        # static shift t = (own level - 1) - candidate level at a time
        for t in range(1, nlevels - 1):
            delta, dvalid = _cross_window(pcells, t, d)
            alev = blev - 1 - t
            aid = jnp.where(valid & (alev >= 0),
                            anc[ciota, jnp.clip(alev, 0)], -1)
            arow = row_of(aid, alev)                        # (cap, m)
            col = ((delta + 1) * col_w[:, None, None]).sum(axis=0)
            cand = jnp.take_along_axis(arow, col, axis=1)   # (cap, 2^d)
            toucht = _touch_off(
                delta, 0, _low_bits(cells, t + 1)[:, :, None], t + 1)
            base = dvalid & (cand >= 0) & ~toucht \
                & at_level(cand, alev)
            ok = base & (has_src & (alev >= 0))[:, None] \
                & ((cand & TGT_BIT) != 0)
            l3_keys.append(jnp.where(
                ok, ((cand & ID_MASK).astype(jnp.int64) << np.int64(32))
                | w_lo, _INVALID_KEY))
            # List 4 excludes the root level (wl >= 1)
            ok = base & (is_totp & (alev >= 1))[:, None] \
                & ((cand & SRC_BIT) != 0)
            l4_keys.append(jnp.where(
                ok, tgt_hi | (cand & ID_MASK).astype(jnp.int64),
                _INVALID_KEY))

        l3 = pack(l3_keys)
        l4 = pack(l4_keys)
        return (s_keys[None], s_count[None], l3[0][None], l3[1][None],
                l4[0][None], l4[1][None])

    spec = NamedSharding(mesh, P(axis, None))
    outs = jax.jit(_shard_map(
        step, mesh,
        (P(axis, None), P(axis, None), P(axis, None, None)),
        (P(axis, None), P(axis), P(axis, None), P(axis),
         P(axis, None), P(axis))))(
        jax.device_put(box_id, spec), jax.device_put(box_level, spec),
        jax.device_put(ntable_rows, NamedSharding(mesh, P(axis, None,
                                                          None))))
    return {"slnws": (outs[0], outs[1]), "l3": (outs[2], outs[3]),
            "l4": (outs[4], outs[5])}


def sharded_edges_to_owner_csr(keys, counts, tree, skel, mesh, *,
                               capacity_factor=4.0):
    """Route per-rank emitted edge keys to their target-row owners and
    assemble each rank's CSR, completing the sharded traversal.

    The emission blocks (:func:`sharded_l1_edges`,
    :func:`sharded_l2_edges`, :func:`sharded_l3l4_edges`) write each
    edge on the rank that *enumerated* it — source-side List-1/3 keys
    and parent-side List-2 keys can name target rows owned elsewhere.
    This block ships every key ``(tgt << 32) | src`` home:

    1. owner of ``tgt``: box ids are level-major, so each rank owns one
       contiguous id range PER LEVEL; one ``all_gather`` of each rank's
       first owned id per level + a reverse cummin (backward fill over
       ranks that own no boxes of a level) gives a per-level monotone
       boundary table, and the owner is a vectorized
       last-boundary-<=-id lookup;
    2. a stable (owner, key) sort makes the buckets contiguous; one
       fixed-capacity ``all_to_all`` ships them (the same pattern as
       :func:`..shard_sort.sharded_key_sort`, with owner boundaries in
       place of sampled splitters);
    3. a local merge sort + one searchsorted of the owned ids yields
       the rank's CSR starts over ALL its owned rows (rows that are not
       targets of this list come out empty).

    :arg keys: (nranks, lanes) int64 per-rank key blocks, valid keys
        sorted first, ``_INVALID_KEY`` pad after (any emission block's
        output).
    :arg counts: (nranks,) valid counts.
    :returns: ``(merged, starts, out_counts, ok)`` — (nranks,
        nranks * cap) int64 received keys (sorted, pad after), (nranks,
        row_cap + 1) int64 CSR starts aligned with ``skel["box_id"]``
        (the last entry is the rank's total), (nranks,) totals, and a
        bool that is False iff a (rank, owner) bucket overflowed
        ``capacity_factor``.
    """
    from boxtree_tpu.traversal.build import _INVALID_KEY

    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    nlevels = tree.nlevels
    box_levels = jnp.asarray(tree.box_levels).astype(jnp.int64)
    huge = jnp.int64(jnp.iinfo(jnp.int64).max)

    box_id = skel["box_id"]
    box_level = skel["box_level"]
    row_cap = box_id.shape[1]
    lanes = keys.shape[1]
    cap = int(np.ceil(capacity_factor * lanes / nranks))

    def step(kblock, cnt, bid, blev):
        kblock, cnt = kblock[0], cnt[0]
        bid = bid[0].astype(jnp.int64)
        blev = blev[0].astype(jnp.int64)
        validrow = bid >= 0
        lane_valid = jnp.arange(lanes) < cnt

        # per-level first owned id, backward-filled over empty ranks
        firsts = []
        for lv in range(nlevels):
            is_l = validrow & (blev == lv)
            firsts.append(jnp.where(is_l.any(), bid[jnp.argmax(is_l)],
                                    huge))
        firsts = lax.all_gather(jnp.stack(firsts), axis)    # (nr, nlv)
        filled = lax.associative_scan(
            jnp.minimum, firsts.T[:, ::-1], axis=1)[:, ::-1]

        tgt = jnp.where(lane_valid, kblock >> np.int64(32), 0)
        lv = box_levels[tgt]
        owner = (filled[lv] <= tgt[:, None]).sum(axis=1) - 1
        owner = jnp.where(lane_valid, owner, nranks)  # pads past ranks

        owner_s, keys_s = lax.sort(
            (owner.astype(jnp.int64), kblock), num_keys=1)
        starts = jnp.searchsorted(
            owner_s, jnp.arange(nranks + 1, dtype=jnp.int64))
        lens = starts[1:] - starts[:-1]
        ok = (lens <= cap).all()

        j = jnp.arange(cap, dtype=jnp.int64)
        rows = starts[:-1, None] + j[None, :]               # (nr, cap)
        valid = j[None, :] < lens[:, None]
        send = jnp.where(valid, keys_s[jnp.clip(rows, 0, lanes - 1)],
                         _INVALID_KEY)
        recv = lax.all_to_all(send, axis, 0, 0, tiled=False)

        merged = lax.sort(recv.reshape(-1))
        total = jnp.searchsorted(merged, _INVALID_KEY).astype(jnp.int64)
        bound = jnp.where(validrow, bid << np.int64(32), huge)
        row_starts = jnp.searchsorted(merged, bound).astype(jnp.int64)
        row_starts = jnp.concatenate([row_starts, total[None]])
        ok = lax.psum(ok.astype(jnp.int32), axis) == nranks
        return merged[None], row_starts[None], total[None], ok[None]

    spec = NamedSharding(mesh, P(axis, None))
    merged, starts, totals, oks = jax.jit(_shard_map(
        step, mesh,
        (P(axis, None), P(axis), P(axis, None), P(axis, None)),
        (P(axis, None), P(axis, None), P(axis), P(axis))))(
        jax.device_put(keys, spec),
        jax.device_put(counts, NamedSharding(mesh, P(axis))),
        jax.device_put(box_id, spec), jax.device_put(box_level, spec))
    return merged, starts, totals, bool(np.asarray(oks).all())


def _sharded_local_csr(keys, counts, skel, mesh):
    """Per-rank CSR over owned rows for an emission block whose keys are
    all locally owned by construction (slnws: every emitted key's target
    is the emitting rank's own box) — the owner exchange of
    :func:`sharded_edges_to_owner_csr` would be a no-op collective plus
    ``nranks * cap`` of wasted buffer per rank, so skip it: the emitted
    keys are already sorted per rank, and one searchsorted of the owned
    ids yields the CSR starts."""
    (axis,) = mesh.axis_names
    huge = jnp.int64(jnp.iinfo(jnp.int64).max)
    box_id = skel["box_id"]

    def step(kblock, cnt, bid):
        kblock, cnt = kblock[0], cnt[0]
        bid = bid[0].astype(jnp.int64)
        bound = jnp.where(bid >= 0, bid << np.int64(32), huge)
        row_starts = jnp.searchsorted(kblock, bound).astype(jnp.int64)
        row_starts = jnp.concatenate([row_starts, cnt[None]])
        return kblock[None], row_starts[None], cnt[None]

    spec = NamedSharding(mesh, P(axis, None))
    merged, starts, totals = jax.jit(_shard_map(
        step, mesh, (P(axis, None), P(axis), P(axis, None)),
        (P(axis, None), P(axis, None), P(axis))))(
        jax.device_put(keys, spec),
        jax.device_put(counts, NamedSharding(mesh, P(axis))),
        jax.device_put(box_id, spec))
    return merged, starts, totals


def sharded_emit_blocks(tree, skel, mesh):
    """Per-rank emission of every interaction-list key block (slnws +
    Lists 1-4) — the first half of :func:`sharded_traversal_lists`,
    exposed separately so a caller can inspect the (ownership-
    independent) emitted edges before routing, e.g. to compute a
    cost-balanced ownership (:func:`cost_partition_bounds`, the
    analogue of the reference's ``partition_work``,
    ``boxtree/distributed/partition.py:60-121``)."""
    ntable_rows = sharded_neighbor_table(tree, skel, mesh)
    blocks = dict(sharded_l3l4_edges(tree, skel, ntable_rows, mesh))
    blocks["l1"] = sharded_l1_edges(tree, skel, ntable_rows, mesh)
    blocks["l2"] = sharded_l2_edges(tree, skel, ntable_rows, mesh)
    return blocks


def sharded_route_blocks(blocks, tree, skel_own, mesh, *,
                         capacity_factor=4.0, emission_is_ownership=True):
    """Route emitted key blocks to their target-row owners and build
    each rank's CSR — the second half of :func:`sharded_traversal_lists`.

    :arg skel_own: the OWNERSHIP skeleton (``box_id`` / ``box_level`` /
        ``nboxes`` per rank) the CSRs are built over — the build's own
        :func:`sharded_box_skeleton` output, or a re-balanced assignment
        from :func:`ownership_skel`.
    :arg emission_is_ownership: True when *skel_own* is the same
        assignment the blocks were emitted under; only then can the
        slnws block skip the owner exchange (its keys are emitted on
        their target's rank by construction).
    """
    out = {}
    for name, (keys, counts) in blocks.items():
        if name == "slnws" and emission_is_ownership:
            # slnws targets are by construction locally owned: skip the
            # owner exchange (one collective + nranks*cap buffer saved)
            out[name] = _sharded_local_csr(keys, counts, skel_own, mesh)
            continue
        merged, starts, totals, ok = sharded_edges_to_owner_csr(
            keys, counts, tree, skel_own, mesh,
            capacity_factor=capacity_factor)
        if not ok:
            raise RuntimeError(
                f"sharded_route_blocks: {name} exchange overflowed "
                f"capacity_factor={capacity_factor}; retry larger")
        out[name] = (merged, starts, totals)
    return out


def sharded_traversal_lists(tree, skel, mesh, *, capacity_factor=4.0,
                            skel_own=None):
    """Per-rank interaction lists, end to end: neighbor table ->
    emission of slnws + Lists 1-4 -> owner exchange -> per-rank CSR.

    One call chaining every sharded-traversal building block.  Each
    entry of the returned dict (keys ``"slnws"``, ``"l1"``, ``"l2"``,
    ``"l3"``, ``"l4"``) is ``(merged, starts, counts)`` as returned by
    :func:`sharded_edges_to_owner_csr`: the rank's received
    ``(tgt << 32) | src`` keys and its CSR starts over ALL its owned
    rows (``skel["box_id"]`` order; rows that are not targets of a list
    are empty).  List 3 is flat over target rows here — the
    single-device per-source-level split (`from_sep_smaller_by_level`)
    is a scheduling choice of the single-device evaluator, and the
    level of a List-3 *source* box is recoverable from the replicated
    ``tree.box_levels``.

    :arg skel_own: optional re-balanced ownership skeleton
        (:func:`ownership_skel`); defaults to *skel* itself.
    :raises RuntimeError: if an exchange bucket overflows
        *capacity_factor* (retry larger).
    """
    blocks = sharded_emit_blocks(tree, skel, mesh)
    return sharded_route_blocks(
        blocks, tree, skel_own if skel_own is not None else skel, mesh,
        capacity_factor=capacity_factor,
        emission_is_ownership=skel_own is None)


def cost_partition_bounds(tree, blocks, mesh, *, order=8, nranks=None):
    """Cost-balanced contiguous particle boundaries from the emitted
    edge blocks — the sharded analogue of the reference's cost-weighted
    DFS partition (``boxtree/distributed/partition.py:60-121``: the
    root ranks boxes in DFS order and cuts contiguous segments of equal
    ``cost_per_box`` prefix).

    One small device program accumulates, per box, the same per-stage
    work terms as :meth:`boxtree_tpu.cost.model.AbstractFMMCostModel.
    cost_per_box` (P2P pairs, M2L/M2P/P2L translations weighted by the
    pde-aware ``(p+1)^(d-1)`` coefficient counts, P2M/L2P evaluation)
    off the per-rank key blocks, ``psum``-combined.  The host then
    (O(nboxes)) prefixes the leaf costs in particle order and cuts
    ``nranks`` equal-cost particle intervals at leaf-box boundaries —
    ownership stays "box belongs to the rank owning its first
    particle", so every downward-halo invariant of the sharded runner
    (chain box = its owner's last box of the level) is preserved.

    :returns: host int64 ``p_bounds`` of shape (nranks + 1,), with
        ``p_bounds[0] == 0`` and ``p_bounds[-1] == n``.
    """
    (axis,) = mesh.axis_names
    if nranks is None:
        nranks = mesh.devices.size
    nboxes = tree.nboxes
    d = tree.dimensions
    lev = jnp.asarray(tree.box_levels).astype(jnp.int64)
    ns = jnp.asarray(tree.box_source_counts_cumul).astype(jnp.float32)
    nt = jnp.asarray(tree.box_target_counts_cumul).astype(jnp.float32)
    # pde-aware coefficient count per level (constant order here; the
    # reference's per-level orders enter through level_to_order, which
    # the caller can fold into *order* — load balance only needs
    # relative weights)
    ncoeff = float((order + 1) ** (d - 1))

    def _shard(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    def step(k1, c1, k2, c2, k3, c3, k4, c4):
        cost = jnp.zeros(nboxes + 1, jnp.float32)

        def add(keys, cnt, weight_of):
            nonlocal cost
            keys, cnt = keys[0], cnt[0]
            lane_ok = jnp.arange(keys.shape[0]) < cnt
            tgt = jnp.where(lane_ok, keys >> np.int64(32), nboxes)
            src = jnp.where(lane_ok, keys & np.int64((1 << 32) - 1), 0)
            cost = cost.at[tgt].add(weight_of(tgt, src))

        # eval_direct: ntargets(tgt) * nsources(src) pairs per edge
        add(k1, c1, lambda t, s: nt[jnp.clip(t, 0, nboxes - 1)] * ns[s])
        # multipole_to_local: ncoeff^2 per edge
        add(k2, c2, lambda t, s: jnp.full(t.shape, ncoeff * ncoeff,
                                          jnp.float32))
        # eval_multipoles: ntargets(tgt) * ncoeff per edge
        add(k3, c3, lambda t, s: nt[jnp.clip(t, 0, nboxes - 1)] * ncoeff)
        # form_locals: nsources(src) * ncoeff per edge
        add(k4, c4, lambda t, s: ns[s] * ncoeff)
        cost = lax.psum(cost[:nboxes], axis)
        # per-box P2M + L2P, added after the psum so it counts once
        # (every rank computes the identical replicated value)
        cost = cost + (ns + nt) * ncoeff
        return cost

    args = []
    for name in ("l1", "l2", "l3", "l4"):
        k, c = blocks[name]
        args += [_shard(k), jax.device_put(
            c, NamedSharding(mesh, P(axis)))]
    sp = P(axis, None)
    cost = np.asarray(jax.jit(_shard_map(
        step, mesh, (sp, P(axis)) * 4, P(None)))(*args))

    # host: per-leaf aggregated costs in particle order -> equal-cost
    # particle cuts.  EVERY box's cost (internal boxes carry the bulk
    # of the M2L work) is charged to the leaf containing its first
    # particle — ownership is by first particle, so that is exactly the
    # rank that will do the box's work.
    flags = np.asarray(tree.box_flags)
    from boxtree_tpu.tree.containers import box_flags_enum as _F
    leaf = np.flatnonzero(flags & _F.IS_LEAF_BOX)
    all_starts = np.asarray(tree.box_source_starts).astype(np.int64)
    starts = all_starts[leaf]
    o = np.argsort(starts, kind="stable")
    leaf, starts = leaf[o], starts[o]
    lcost = np.zeros(len(leaf))
    np.add.at(lcost,
              np.searchsorted(starts, all_starts, side="right") - 1,
              cost)
    prefix = np.concatenate([[0.0], np.cumsum(lcost)])
    total = prefix[-1]
    n = int(tree.nsources)
    bounds = np.empty(nranks + 1, np.int64)
    bounds[0], bounds[-1] = 0, n
    for r in range(1, nranks):
        i = int(np.searchsorted(prefix, total * r / nranks))
        i = min(max(i, 1), len(leaf) - 1)
        bounds[r] = starts[i]
    # boundaries must be nondecreasing (degenerate distributions can
    # collapse cuts onto the same leaf)
    np.maximum.accumulate(bounds, out=bounds)
    return bounds


def ownership_skel(tree, p_bounds, mesh):
    """Ownership skeleton for arbitrary contiguous particle boundaries:
    rank ``r`` owns the boxes whose first particle lies in
    ``[p_bounds[r], p_bounds[r+1])`` (host O(nboxes); the sharded
    analogue of scattering the reference's ``responsible_boxes_list``).

    Returns a dict with the fields the routing/runner layers read:
    ``box_id`` / ``box_level`` (nranks, cap) sharded, ``nboxes``
    (nranks,) — same layout as :func:`sharded_box_skeleton` (ids
    ascending per rank, -1 pad)."""
    (axis,) = mesh.axis_names
    nranks = mesh.devices.size
    p_bounds = np.asarray(p_bounds, np.int64)
    starts = np.asarray(tree.box_source_starts).astype(np.int64)
    levels = np.asarray(tree.box_levels)
    owner = np.searchsorted(p_bounds, starts, side="right") - 1
    owner = np.clip(owner, 0, nranks - 1)
    counts = np.bincount(owner, minlength=nranks)
    cap = max(1, int(counts.max()))
    box_id = np.full((nranks, cap), -1, np.int64)
    box_level = np.zeros((nranks, cap), np.int32)
    for r in range(nranks):
        ids = np.flatnonzero(owner == r)          # ascending
        box_id[r, :len(ids)] = ids
        box_level[r, :len(ids)] = levels[ids]
    spec = NamedSharding(mesh, P(axis, None))
    return {
        "box_id": jax.device_put(jnp.asarray(box_id), spec),
        "box_level": jax.device_put(jnp.asarray(box_level), spec),
        "nboxes": jnp.asarray(counts.astype(np.int64)),
    }
