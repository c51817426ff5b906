"""Pallas TPU kernel for the P2P (direct-interaction) FMM stage.

P2P is the FLOP-heaviest FMM stage: for every List-1 edge
``(target box, source box)`` it evaluates the kernel between all pairs of
the two boxes' particle blocks.  The XLA path (``expansion_base.py``)
gathers both blocks per edge and lets XLA fuse the pairwise evaluation;
this Pallas kernel instead uses *scalar-prefetched* edge indices to DMA
exactly the two blocks each grid step needs into VMEM and evaluates the
(P x P) interaction tile there — the gather becomes part of the software
pipeline instead of a separate HBM pass.

The kernel is generic over inverse-distance kernels via ``kind``:
``"coulomb"`` (3D Laplace, 1/r) and ``"log"`` (2D Laplace, log r).
Self-interactions (r == 0) and padded lanes contribute zero.

Used by the Laplace wranglers when ``BOXTREE_TPU_PALLAS_P2P=1`` (the XLA
path remains the default); unit-tested against the XLA path in
interpreter mode so the kernel is exercised on CPU-only CI as well.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _p2p_kernel(tgt_idx_ref, src_idx_ref, tgt_pts_ref, src_pts_ref,
                q_ref, mask_ref, out_ref, *, kind):
    del tgt_idx_ref, src_idx_ref  # consumed by the index maps
    tgt = tgt_pts_ref[0]                     # (P, d)
    src = src_pts_ref[0]                     # (P, d)
    q = q_ref[0]                             # (P, C)
    valid = mask_ref[0]                      # (P,)

    diff = tgt[:, None, :] - src[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)       # (P, P)
    ok = (r2 > 0) & valid[None, :]
    r2s = jnp.where(ok, r2, 1.0)
    if kind == "coulomb":
        g = jax.lax.rsqrt(r2s)
    elif kind == "log":
        g = 0.5 * jnp.log(r2s)
    else:
        raise ValueError(kind)
    g = jnp.where(ok, g, 0.0)
    out_ref[0] = g @ q


@partial(jax.jit, static_argnames=("kind", "interpret"))
def p2p_edges(tgt_idx, src_idx, tgt_points, src_points, q_blocks,
              src_mask, *, kind="coulomb", interpret=False):
    """Per-edge P2P potentials.

    :arg tgt_idx, src_idx: ``int32 [nedges]`` box ids per List-1 edge.
    :arg tgt_points, src_points: ``(nboxes, P, d)`` particle blocks.
    :arg q_blocks: ``(nboxes, P)`` or ``(nboxes, P, C)`` real source
        weight channels (complex charges run as two channels; the kernel
        evaluates all channels from one pass over the geometry).
    :arg src_mask: ``(nboxes, P)`` bool validity.
    :returns: ``(nedges, P)`` / ``(nedges, P, C)`` potentials at the
        target block lanes.
    """
    nedges = tgt_idx.shape[0]
    _, p, d = tgt_points.shape
    squeeze = q_blocks.ndim == 2
    if squeeze:
        q_blocks = q_blocks[..., None]
    c = q_blocks.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nedges,),
        in_specs=[
            pl.BlockSpec((1, p, d), lambda i, t, s: (t[i], 0, 0)),
            pl.BlockSpec((1, p, d), lambda i, t, s: (s[i], 0, 0)),
            pl.BlockSpec((1, p, c), lambda i, t, s: (s[i], 0, 0)),
            pl.BlockSpec((1, p), lambda i, t, s: (s[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, p, c), lambda i, t, s: (i, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_p2p_kernel, kind=kind),
        out_shape=jax.ShapeDtypeStruct((nedges, p, c), tgt_points.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tgt_idx.astype(jnp.int32), src_idx.astype(jnp.int32),
      tgt_points, src_points, q_blocks, src_mask)
    return out[..., 0] if squeeze else out
