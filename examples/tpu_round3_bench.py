"""Run the round-3 TPU measurement batch in ONE process.

Shares the 3D tree/traversal compile between the M2L and P2P
microbenches (the axon tunnel repays every compile per process), then
runs the end-to-end Laplace FMM wall-clock measurement.  Sections are
independent: a failure in one prints and moves on.

Env: SKIP (comma list of m2l,p2p,fmm), plus each section's own knobs.
"""

import os
import time
import traceback

import numpy as np

t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - t0:7.1f}s] == {msg}", flush=True)


import boxtree_tpu  # noqa: F401,E402
import jax  # noqa: E402

from boxtree_tpu import build_tree  # noqa: E402
from boxtree_tpu.traversal import build_traversal  # noqa: E402

import tpu_fmm_bench  # noqa: E402
import tpu_m2l_bench  # noqa: E402
import tpu_p2p_bench  # noqa: E402


def main():
    skip = set(os.environ.get("SKIP", "").split(","))
    log(f"device={jax.devices()[0].platform}")

    trav3 = None
    if {"m2l", "p2p"} - skip:
        rng = np.random.default_rng(17)
        pts = rng.random((3, int(float(os.environ.get("N3", 2e5)))),
                         np.float32)
        tree = build_tree(jax.device_put(pts),
                          max_particles_in_box=int(
                              os.environ.get("MAXP", 60)))
        trav3 = build_traversal(tree)
        log(f"shared 3D tree: {tree.nboxes} boxes")

    for name, fn in (("m2l", lambda: tpu_m2l_bench.main(trav3)),
                     ("p2p", lambda: tpu_p2p_bench.main(trav3)),
                     ("fmm", tpu_fmm_bench.main)):
        if name in skip:
            continue
        log(f"section {name}")
        try:
            fn()
        except Exception:
            traceback.print_exc()
            log(f"section {name} FAILED (continuing)")
    log("done")


if __name__ == "__main__":
    main()
