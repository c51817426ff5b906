"""Row-major M2P (List 3) and P2L (List 4) fast paths == the edge
formulation.

Like the row-major List-1 P2P (doc/PERF.md), the fast paths trade the
edge path's per-edge gathers + scatter-adds for padded per-target-row
maps with contiguous writes; both formulations must agree to roundoff.
The edge path is forced by breaking the driver-identity check (a copied
list object / ``starts + 0``)."""

import jax.numpy as jnp
import numpy as np

from boxtree_tpu import build_tree
from boxtree_tpu.models.laplace import make_laplace_wrangler
from boxtree_tpu.traversal import build_traversal


def _force_rowmaps(monkeypatch):
    # the production waste guards may reject the maps on skewed trees;
    # the oracle must exercise the fast paths regardless
    from boxtree_tpu.models.expansion_base import ExpansionWranglerBase
    monkeypatch.setattr(ExpansionWranglerBase,
                        "_M2P_ROWMAJOR_MAX_WASTE", float("inf"))
    monkeypatch.setattr(ExpansionWranglerBase,
                        "_P2L_ROWMAJOR_MAX_WASTE", float("inf"))


def _setup(n=6000, order=5, seed=11, **kw):
    from boxtree_tpu.utils.particles import make_surface_particle_array
    rng = np.random.default_rng(seed)
    # surface distribution: strongly nonuniform, so Lists 3/4 are
    # populated (uniform clouds at this size have none)
    pts = make_surface_particle_array(n, 3, np.float64, seed=seed)
    tree = build_tree(pts, max_particles_in_box=40)
    trav = build_traversal(tree)
    w = make_laplace_wrangler(trav, order=order, pairs=True,
                              dtype=np.float64, **kw)
    q = jnp.asarray(rng.standard_normal(n))
    return w, trav, q, rng


def test_m2p_rowmajor_matches_edges(monkeypatch):
    _force_rowmaps(monkeypatch)
    w, trav, q, rng = _setup()
    assert w._m2p_rowmap is not None
    mp = jnp.asarray(rng.standard_normal(
        (w.tree.nboxes, w.ncoeff))).astype(w.dtype)
    fast = w.eval_multipoles(
        trav.target_boxes_sep_smaller_by_source_level,
        trav.from_sep_smaller_by_level, mp)
    edge = w.eval_multipoles(
        trav.target_boxes_sep_smaller_by_source_level,
        list(trav.from_sep_smaller_by_level), mp)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(edge),
                               rtol=1e-12, atol=1e-12)


def _p2l_both(w, trav, q):
    fast = w.form_locals(
        trav.level_start_target_or_target_parent_box_nrs,
        trav.target_or_target_parent_boxes,
        trav.from_sep_bigger_starts, trav.from_sep_bigger_lists, (q,))
    edge = w.form_locals(
        trav.level_start_target_or_target_parent_box_nrs,
        trav.target_or_target_parent_boxes,
        trav.from_sep_bigger_starts + 0, trav.from_sep_bigger_lists,
        (q,))
    return fast, edge


def test_p2l_rowmajor_matches_edges(monkeypatch):
    _force_rowmaps(monkeypatch)
    w, trav, q, _ = _setup()
    assert w._p2l_rowmap is not None
    fast, edge = _p2l_both(w, trav, q)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(edge),
                               rtol=1e-12, atol=1e-12)


def test_p2l_rowmajor_dipoles(monkeypatch):
    _force_rowmaps(monkeypatch)
    rng = np.random.default_rng(3)
    n = 6000
    dip = rng.standard_normal((3, n))
    w, trav, q, _ = _setup(dipole_vec=dip)
    assert w._p2l_rowmap is not None
    fast, edge = _p2l_both(w, trav, q)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(edge),
                               rtol=1e-12, atol=1e-12)


def test_rowmajor_with_rscale_and_level_orders(monkeypatch):
    _force_rowmaps(monkeypatch)
    # per-level rscale + level-truncated orders exercise the scale and
    # coeff-mask branches of both fast paths
    w, trav, q, rng = _setup(order=None, rscale="auto",
                             level_to_order=lambda lev: max(3, 6 - lev))
    assert w._m2p_rowmap is not None and w._p2l_rowmap is not None
    mp = jnp.asarray(rng.standard_normal(
        (w.tree.nboxes, w.ncoeff))).astype(w.dtype)
    fast = w.eval_multipoles(
        trav.target_boxes_sep_smaller_by_source_level,
        trav.from_sep_smaller_by_level, mp)
    edge = w.eval_multipoles(
        trav.target_boxes_sep_smaller_by_source_level,
        list(trav.from_sep_smaller_by_level), mp)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(edge),
                               rtol=1e-11, atol=1e-11)
    fast, edge = _p2l_both(w, trav, q)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(edge),
                               rtol=1e-11, atol=1e-11)


def test_m2p_rowmajor_pair_lanes(monkeypatch):
    _force_rowmaps(monkeypatch)
    # Helmholtz pairs wranglers carry [re, im] potential lanes
    # (_pot_extra_dims == (2,)) — the mask/sum must broadcast over them
    from boxtree_tpu.models.helmholtz3d import make_helmholtz_wrangler
    from boxtree_tpu.utils.particles import make_surface_particle_array
    rng = np.random.default_rng(5)
    n = 4000
    pts = make_surface_particle_array(n, 3, np.float64, seed=5)
    tree = build_tree(pts, max_particles_in_box=60)
    trav = build_traversal(tree)
    w = make_helmholtz_wrangler(trav, helmholtz_k=2.0, order=4,
                                pairs=True, dtype=np.float64)
    assert w._m2p_rowmap is not None
    mp = jnp.asarray(rng.standard_normal(
        (w.tree.nboxes, w.ncoeff))).astype(w.dtype)
    fast = w.eval_multipoles(
        trav.target_boxes_sep_smaller_by_source_level,
        trav.from_sep_smaller_by_level, mp)
    edge = w.eval_multipoles(
        trav.target_boxes_sep_smaller_by_source_level,
        list(trav.from_sep_smaller_by_level), mp)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(edge),
                               rtol=1e-12, atol=1e-12)


def test_m2l_parent_dense_matches_class_dense(monkeypatch):
    """The parent-block M2L (one gathered (2^d K) row per (parent,
    colleague) serving all children, r5) equals the class-dense map
    formulation — which is itself equality-tested against the grouped
    edge path — in f64 to roundoff, on an adaptive tree with boundary
    and leaf-parent irregularities."""
    from boxtree_tpu.models.expansion_base import ExpansionWranglerBase
    monkeypatch.setattr(ExpansionWranglerBase, "_M2L_EDGE_CHUNK", 1)
    monkeypatch.setattr(ExpansionWranglerBase, "_M2L_DENSE_MAP_BYTES",
                        1 << 34)
    rng = np.random.default_rng(4)
    pts = np.concatenate([rng.random((3, 6000)),
                          rng.random((3, 3000)) * 0.12 + 0.2], axis=1)
    tree = build_tree(pts, max_particles_in_box=20)
    trav = build_traversal(tree)
    w = make_laplace_wrangler(trav, order=3, pairs=True, rscale="auto",
                              dtype=np.float64)
    assert w._m2l_parent is not None, \
        "static pair count must match the traversal edge count"
    mp = jnp.asarray(rng.standard_normal(
        (tree.nboxes, w.ncoeff)))
    got = np.asarray(w._m2l_parent_dense(mp))
    ref = np.asarray(w._m2l_class_dense(mp))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)
