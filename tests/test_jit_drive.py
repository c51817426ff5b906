"""jit_drive_fmm: whole-driver jit with device arrays as parameters.

The tunneled-TPU remote compile service rejects programs whose
serialized payload embeds large closure constants (HTTP 413 at a
~100 MB dense M2L table).  jit_drive_fmm must (a) produce bitwise the
same potentials as the eager driver, and (b) shrink the serialized
program by orders of magnitude vs the closure-capturing jit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from boxtree_tpu import build_tree
from boxtree_tpu.fmm import drive_fmm, jit_drive_fmm
from boxtree_tpu.models.laplace import make_laplace_wrangler
from boxtree_tpu.traversal import build_traversal


def _setup(n=4000, order=5, **kw):
    rng = np.random.default_rng(97)
    pts = rng.random((3, n))
    tree = build_tree(pts, max_particles_in_box=40)
    trav = build_traversal(tree)
    w = make_laplace_wrangler(trav, order=order, **kw)
    charges = jnp.asarray(rng.standard_normal(n))
    return w, charges


def test_jit_drive_fmm_matches_eager():
    w, charges = _setup()
    pot_eager = drive_fmm(w, (charges,))
    f = jit_drive_fmm(w)
    pot_jit = f(charges)
    np.testing.assert_allclose(np.asarray(pot_jit),
                               np.asarray(pot_eager),
                               rtol=1e-12, atol=1e-12)


def test_jit_drive_fmm_pairs_wrangler():
    w, charges = _setup(order=4, pairs=True, dtype=np.float32)
    pot_eager = drive_fmm(w, (charges.astype(jnp.float32),))
    pot_jit = jit_drive_fmm(w)(charges.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(pot_jit),
                               np.asarray(pot_eager),
                               rtol=1e-5, atol=1e-5)


def test_staged_drive_fmm_matches_eager():
    from boxtree_tpu.fmm import staged_drive_fmm
    w, charges = _setup()
    pot_eager = drive_fmm(w, (charges,))
    pot = staged_drive_fmm(w)(charges)
    np.testing.assert_allclose(np.asarray(pot), np.asarray(pot_eager),
                               rtol=1e-12, atol=1e-12)


def test_m2l_edge_chunking_matches_one_shot(monkeypatch):
    """The chunked (scan-over-edge-chunks) M2L must equal the one-shot
    formulation bitwise, in both dense and rotation modes."""
    from boxtree_tpu.models.expansion_base import ExpansionWranglerBase

    for mode in ("dense", "rotation"):
        w, charges = _setup(n=3000, order=4, m2l_mode=mode)
        mp = w.form_multipoles(
            w.traversal.level_start_source_box_nrs,
            w.traversal.source_boxes, (w.reorder_sources(charges),))
        one = w.multipole_to_local_edges(
            w.m2l_plan.tgt, w.m2l_plan.src, w.m2l_plan.group_sizes, mp)
        assert int(w.m2l_plan.tgt.shape[0]) > 64   # chunking will kick in
        monkeypatch.setattr(ExpansionWranglerBase, "_M2L_EDGE_CHUNK", 64)
        chunked = w.multipole_to_local_edges(
            w.m2l_plan.tgt, w.m2l_plan.src, w.m2l_plan.group_sizes, mp)
        monkeypatch.undo()
        np.testing.assert_array_equal(np.asarray(chunked),
                                      np.asarray(one))


def test_m2l_tiled_matches_one_shot(monkeypatch):
    """The tile-aligned batched M2L path (big-edge-set fast path) must
    equal the one-shot grouped formulation bitwise, eagerly and under
    the staged driver."""
    from boxtree_tpu.models.expansion_base import ExpansionWranglerBase

    monkeypatch.setenv("BOXTREE_TPU_M2L_CLASS_DENSE", "0")
    monkeypatch.setattr(ExpansionWranglerBase, "_M2L_EDGE_CHUNK", 128)
    monkeypatch.setattr(ExpansionWranglerBase, "_M2L_TILE", 32)
    monkeypatch.setattr(ExpansionWranglerBase, "_M2L_TILE_BATCH", 4)
    w, charges = _setup(n=3000, order=4)
    assert int(w.m2l_plan.tgt.shape[0]) > 128
    assert getattr(w.m2l_plan, "_tiled_cache", None) is not None

    mp = w.form_multipoles(
        w.traversal.level_start_source_box_nrs,
        w.traversal.source_boxes, (w.reorder_sources(charges),))
    one = w.multipole_to_local_edges(
        w.m2l_plan.tgt, w.m2l_plan.src,
        w.m2l_plan.group_sizes, mp)
    tiled = w.multipole_to_local(None, None, None, None, mp)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(one))

    # full staged driver through the tiled path == eager driver
    pot_eager = drive_fmm(w, (charges,))
    from boxtree_tpu.fmm import staged_drive_fmm
    pot = staged_drive_fmm(w)(charges)
    np.testing.assert_allclose(np.asarray(pot), np.asarray(pot_eager),
                               rtol=1e-12, atol=1e-12)


def test_m2l_class_dense_matches_one_shot(monkeypatch):
    """The scatter-free dense M2L (parent-block by default, r5; the
    class-dense map where the static pair set doesn't apply) must
    match the one-shot grouped formulation to roundoff, eagerly and
    under the staged driver."""
    from boxtree_tpu.models.expansion_base import ExpansionWranglerBase

    monkeypatch.setattr(ExpansionWranglerBase, "_M2L_EDGE_CHUNK", 128)
    monkeypatch.setattr(ExpansionWranglerBase, "_M2L_DENSE_ROWS", 32)
    w, charges = _setup(n=3000, order=4)
    assert w._m2l_use_class_dense()
    assert (w._m2l_parent is not None
            or getattr(w.m2l_plan, "_class_dense_cache", None)
            is not None)

    mp = w.form_multipoles(
        w.traversal.level_start_source_box_nrs,
        w.traversal.source_boxes, (w.reorder_sources(charges),))
    one = w.multipole_to_local_edges(
        w.m2l_plan.tgt, w.m2l_plan.src,
        w.m2l_plan.group_sizes, mp)
    dense = w.multipole_to_local(None, None, None, None, mp)
    # different reduction order (big matmul vs per-edge adds):
    # roundoff-level agreement, not bitwise
    scale = np.abs(np.asarray(one)).max()
    np.testing.assert_allclose(np.asarray(dense), np.asarray(one),
                               atol=1e-12 * max(scale, 1e-300))

    pot_eager = drive_fmm(w, (charges,))
    from boxtree_tpu.fmm import staged_drive_fmm
    pot = staged_drive_fmm(w)(charges)
    np.testing.assert_allclose(np.asarray(pot), np.asarray(pot_eager),
                               rtol=1e-11, atol=1e-11)


def test_jit_drive_fmm_payload_is_small():
    w, charges = _setup(n=2000, order=8)

    def payload_bytes(lowered):
        return len(lowered.compiler_ir("hlo")
                   .as_serialized_hlo_module_proto())

    closure = jax.jit(lambda q: drive_fmm(w, (q,))).lower(charges)
    table_bytes = w._m2l_opsT.nbytes

    leaves = []
    from boxtree_tpu.fmm.drive import _harvest
    tmpl = _harvest(w, leaves, set(), min_bytes=65536)

    @jax.jit
    def f(leaves, q):
        from boxtree_tpu.fmm.drive import _fill
        return drive_fmm(_fill(tmpl, leaves), (q,))

    param = jax.jit(f).lower(leaves, charges)
    closure_sz = payload_bytes(closure)
    param_sz = payload_bytes(param)
    # the closure program embeds at least the operator table; the
    # parameterized one must not
    assert closure_sz > table_bytes
    assert param_sz < table_bytes // 4
    assert param_sz < closure_sz // 10
