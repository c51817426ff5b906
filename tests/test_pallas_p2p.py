"""Pallas P2P kernel vs a numpy reference (interpreter mode, so the
kernel logic is exercised on CPU-only runs too)."""

import numpy as np
import pytest

from boxtree_tpu.ops.pallas_p2p import p2p_edges


@pytest.mark.parametrize("kind,dim", [("coulomb", 3), ("log", 2)])
def test_pallas_p2p_vs_reference(kind, dim):
    rng = np.random.default_rng(15)
    nboxes, p = 12, 16
    pts = rng.random((nboxes, p, dim))
    q = rng.standard_normal((nboxes, p))
    mask = rng.random((nboxes, p)) < 0.8
    nedges = 30
    tgt = rng.integers(0, nboxes, nedges).astype(np.int32)
    src = rng.integers(0, nboxes, nedges).astype(np.int32)

    out = np.asarray(p2p_edges(tgt, src, pts, pts, q, mask,
                               kind=kind, interpret=True))

    for e in range(nedges):
        diff = pts[tgt[e]][:, None, :] - pts[src[e]][None, :, :]
        r2 = (diff ** 2).sum(-1)
        ok = (r2 > 0) & mask[src[e]][None, :]
        if kind == "coulomb":
            g = np.where(ok, 1 / np.sqrt(np.where(ok, r2, 1)), 0)
        else:
            g = np.where(ok, 0.5 * np.log(np.where(ok, r2, 1)), 0)
        ref = g @ q[src[e]]
        assert np.allclose(out[e], ref, rtol=1e-12), e


def test_pallas_p2p_in_laplace_fmm(monkeypatch):
    # full 3D Laplace FMM with the Pallas P2P backend (interpret on CPU)
    monkeypatch.setenv("BOXTREE_TPU_PALLAS_P2P", "1")
    from boxtree_tpu import build_tree
    from boxtree_tpu.fmm import drive_fmm
    from boxtree_tpu.models.laplace import make_laplace_wrangler
    from boxtree_tpu.traversal import build_traversal

    rng = np.random.default_rng(30)
    n = 800
    pts = rng.random((3, n))
    charges = rng.standard_normal(n)
    tree = build_tree(pts, max_particles_in_box=16)
    trav = build_traversal(tree)
    w = make_laplace_wrangler(trav, order=10)
    pot = np.asarray(drive_fmm(w, (charges,))).real

    diff = pts[:, :, None] - pts[:, None, :]
    r2 = (diff * diff).sum(axis=0)
    g = np.where(r2 > 0, 1 / np.sqrt(np.where(r2 > 0, r2, 1)), 0)
    ref = g @ charges
    rel = np.max(np.abs(pot - ref)) / np.max(np.abs(ref))
    assert rel < 1e-5, rel
