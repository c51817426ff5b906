"""Decompose the on-TPU f32 accuracy gap (VERDICT r3 weak #7).

The chip rejects f64 dots, so Config D (3D Laplace, rel err < 1e-5 vs
direct) can only run in f32 there; round 3 measured rel l-inf 7.4e-3 at
1e6 vs an f32 on-device direct sum.  This script separates, on CPU
where f64 is available, the three error sources at ACC_N (default 2e5)
points, order ACC_ORDER (default 8):

  A. truncation:      f64 FMM     vs f64 direct
  B. f32 arithmetic:  f32 FMM     vs f64 FMM   (same tree/expansions)
  C. f32 direct:      f32 direct  vs f64 direct

If B ~ C ~ 1e-6..1e-5 then the 7.4e-3 was dominated by A (order too
low for that tree depth) and the fix is level_to_order, not
compensated arithmetic; if B >> C the expansion pipeline loses f32
digits (rscale / cancellation) and needs the compensated path.

Run: JAX_PLATFORMS=cpu timeout 3000 python scripts/accuracy_decompose.py
"""

import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np                                        # noqa: E402
import jax                                                # noqa: E402
import jax.numpy as jnp                                   # noqa: E402

from boxtree_tpu import build_tree                        # noqa: E402
from boxtree_tpu.traversal import build_traversal         # noqa: E402
from boxtree_tpu.fmm import drive_fmm                     # noqa: E402
from boxtree_tpu.models.laplace import (                  # noqa: E402
    make_laplace_wrangler)

N = int(float(os.environ.get("ACC_N", 2e5)))
ORDER = int(os.environ.get("ACC_ORDER", 8))
NEVAL = 2000        # direct-sum reference targets (O(N*NEVAL) host work)

rng = np.random.default_rng(42)
pts64 = rng.random((3, N))
q64 = rng.standard_normal(N)
t0 = time.perf_counter()

tree = build_tree(pts64, max_particles_in_box=30)
trav = build_traversal(tree)
print(f"# tree: {tree.nboxes} boxes, {tree.nlevels} levels "
      f"({time.perf_counter() - t0:.0f}s)", flush=True)

sel = rng.choice(N, NEVAL, replace=False)


def direct(dtype):
    p = pts64.astype(dtype)
    qq = q64.astype(dtype)
    out = np.zeros(NEVAL, dtype)
    for i, t in enumerate(sel):
        d = p[:, t][:, None] - p
        r = np.sqrt((d * d).sum(0))
        g = np.where(r > 0, 1.0 / np.where(r > 0, r, 1.0), 0.0)
        out[i] = (g * qq).sum(dtype=dtype)
    return out


ref64 = direct(np.float64)
ref32 = direct(np.float32)
scale = np.abs(ref64).max()


def rel(x):
    return float(np.abs(np.asarray(x, np.float64) - ref64).max() / scale)


print(f"# C. f32 direct vs f64 direct: {rel(ref32):.3e}", flush=True)

res = {}
for label, kwargs in [
        ("f64", dict(dtype=np.complex128)),
        ("f64_rscale", dict(dtype=np.complex128, rscale="auto")),
        ("f32_pairs", dict(dtype=np.float32, pairs=True, rscale="auto")),
        ("f64_pairs", dict(dtype=np.float64, pairs=True, rscale="auto")),
]:
    t0 = time.perf_counter()
    w = make_laplace_wrangler(trav, order=ORDER, **kwargs)
    pot = np.asarray(drive_fmm(w, (q64.astype(
        np.float32 if kwargs.get("dtype") == np.float32 else np.float64),)))
    res[label] = pot
    print(f"# {label}: rel vs f64 direct = {rel(pot[sel]):.3e} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

b = np.abs(res["f32_pairs"][sel].astype(np.float64)
           - res["f64_pairs"][sel]).max() / scale
print(f"# B. f32 arithmetic (f32_pairs vs f64_pairs): {b:.3e}")
print(f"# A. truncation (f64_rscale vs direct) above; order={ORDER}")
