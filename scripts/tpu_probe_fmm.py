"""Isolate the UNIMPLEMENTED TPU op in the Laplace FMM path.

Each probe runs in a FRESH subprocess (a failed TPU call poisons the
worker for the rest of the process).  Probes are ordered from primitive
to composite; the first failure names the culprit.

Run: timeout 3000 python scripts/tpu_probe_fmm.py
"""

import json
import os
import subprocess
import sys
import time

PROBES = {
    "c64_matmul": """
import jax, jax.numpy as jnp
a = jnp.ones((64, 81), jnp.complex64)
b = jnp.ones((81, 81), jnp.complex64)
print(jax.jit(lambda a, b: (a @ b).real.sum())(a, b))
""",
    "c64_scan_matmul": """
import jax, jax.numpy as jnp
from jax import lax
a = jnp.ones((8, 64, 81), jnp.complex64)
b = jnp.ones((8, 81, 81), jnp.complex64)
def f(a, b):
    def body(c, ab):
        x, y = ab
        return c + (x @ y).real.sum(), None
    out, _ = lax.scan(body, jnp.float32(0), (a, b))
    return out
print(jax.jit(f)(a, b))
""",
    "wrangler_setup": """
import numpy as np, jax
from boxtree_tpu import build_tree
from boxtree_tpu.traversal import build_traversal
from boxtree_tpu.models.laplace import make_laplace_wrangler
rng = np.random.default_rng(1)
pts = jax.device_put(rng.random((3, 4000), dtype=np.float32))
tree = build_tree(pts, max_particles_in_box=40)
trav = build_traversal(tree)
w = make_laplace_wrangler(trav, order=6, dtype=np.complex64, rscale="auto")
print("setup ok", w.order)
""",
    "fmm_stagewise": """
import numpy as np, jax, jax.numpy as jnp
from boxtree_tpu import build_tree
from boxtree_tpu.traversal import build_traversal
from boxtree_tpu.models.laplace import make_laplace_wrangler
rng = np.random.default_rng(1)
pts = jax.device_put(rng.random((3, 4000), dtype=np.float32))
tree = build_tree(pts, max_particles_in_box=40)
trav = build_traversal(tree)
w = make_laplace_wrangler(trav, order=6, dtype=np.complex64, rscale="auto")
q = jnp.asarray(rng.standard_normal(4000).astype(np.float32))
qs = w.reorder_sources(q)
mp = jax.jit(lambda q: w.form_multipoles(
    trav.level_start_source_box_nrs, trav.source_boxes, (q,)))(qs)
jax.block_until_ready(mp); print("P2M ok")
mp2 = jax.jit(lambda m: w.coarsen_multipoles(
    trav.level_start_source_parent_box_nrs, trav.source_parent_boxes,
    m))(mp)
jax.block_until_ready(mp2); print("M2M ok")
pot = jax.jit(lambda q: w.eval_direct(
    trav.target_boxes, trav.neighbor_source_boxes_starts,
    trav.neighbor_source_boxes_lists, (q,)))(qs)
jax.block_until_ready(pot); print("P2P ok")
loc = jax.jit(lambda m: w.multipole_to_local(
    trav.level_start_target_or_target_parent_box_nrs,
    trav.target_or_target_parent_boxes, trav.from_sep_siblings_starts,
    trav.from_sep_siblings_lists, m))(mp2)
jax.block_until_ready(loc); print("M2L ok")
pot2 = jax.jit(lambda m: w.eval_multipoles(
    trav.target_boxes_sep_smaller_by_source_level,
    trav.from_sep_smaller_by_level, m))(mp2)
jax.block_until_ready(pot2); print("M2P ok")
loc4 = jax.jit(lambda q: w.form_locals(
    trav.level_start_target_or_target_parent_box_nrs,
    trav.target_or_target_parent_boxes, trav.from_sep_bigger_starts,
    trav.from_sep_bigger_lists, (q,)))(qs)
jax.block_until_ready(loc4); print("P2L ok")
loc5 = jax.jit(lambda l: w.refine_locals(
    trav.level_start_target_or_target_parent_box_nrs,
    trav.target_or_target_parent_boxes, l))(loc)
jax.block_until_ready(loc5); print("L2L ok")
pot3 = jax.jit(lambda l: w.eval_locals(
    trav.level_start_target_box_nrs, trav.target_boxes, l))(loc5)
jax.block_until_ready(pot3); print("L2P ok")
""",
    "fmm_onejit": """
import numpy as np, jax, jax.numpy as jnp
from boxtree_tpu import build_tree
from boxtree_tpu.traversal import build_traversal
from boxtree_tpu.fmm import drive_fmm
from boxtree_tpu.models.laplace import make_laplace_wrangler
rng = np.random.default_rng(1)
pts = jax.device_put(rng.random((3, 4000), dtype=np.float32))
tree = build_tree(pts, max_particles_in_box=40)
trav = build_traversal(tree)
w = make_laplace_wrangler(trav, order=6, dtype=np.complex64, rscale="auto")
q = jnp.asarray(rng.standard_normal(4000).astype(np.float32))
pot = jax.jit(lambda q: drive_fmm(w, (q,)))(q)
jax.block_until_ready(pot)
print("one-jit drive ok", float(jnp.real(pot).sum()))
""",
}


def main():
    t0 = time.monotonic()
    for name, code in PROBES.items():
        if time.monotonic() - t0 > 2700:
            print(json.dumps({"probe": name, "skipped": "budget"}))
            continue
        t = time.monotonic()
        proc = subprocess.run(
            [sys.executable, "-c",
             "import boxtree_tpu\n" + code],
            capture_output=True, text=True, timeout=900)
        tail = (proc.stdout.strip().splitlines() or [""])[-3:]
        err = ""
        if proc.returncode != 0:
            lines = proc.stderr.strip().splitlines()
            err = lines[-1][:300] if lines else "?"
        print(json.dumps({
            "probe": name, "rc": proc.returncode,
            "t": round(time.monotonic() - t, 1),
            "out": tail, "err": err}), flush=True)


if __name__ == "__main__":
    os.environ.setdefault("BOXTREE_TPU_CACHE",
                          os.path.expanduser("~/.cache/jax_tpu"))
    main()
