"""Narrow the UNIMPLEMENTED complex support on the tunneled TPU.

Fresh subprocess per probe; first failure per probe names the culprit.
Run: timeout 3000 python scripts/tpu_probe_c64.py
"""

import json
import os
import subprocess
import sys
import time

PROBES = {
    "c64_add": """
import jax, jax.numpy as jnp
x = jnp.ones(128, jnp.complex64)
print(jax.jit(lambda x: (x + x).real.sum())(x))
""",
    "c64_mul": """
import jax, jax.numpy as jnp
x = jnp.ones(128, jnp.complex64)
print(jax.jit(lambda x: (x * x * 1j).real.sum())(x))
""",
    "c64_construct": """
import jax, jax.numpy as jnp
a = jnp.ones(128, jnp.float32)
print(jax.jit(lambda a: jax.lax.complex(a, a).imag.sum())(a))
""",
    "c64_scatter_add": """
import jax, jax.numpy as jnp
x = jnp.ones((16, 8), jnp.complex64)
idx = jnp.arange(16) % 4
f = lambda x: jnp.zeros((4, 8), jnp.complex64).at[idx].add(x).real.sum()
print(jax.jit(f)(x))
""",
    "c64_mm_as_real": """
import jax, jax.numpy as jnp
a = jnp.ones((64, 81), jnp.complex64)
b = jnp.ones((81, 81), jnp.complex64)
def mm(a, b):
    t1 = a.real @ b.real
    t2 = a.imag @ b.imag
    t3 = (a.real + a.imag) @ (b.real + b.imag)
    return jax.lax.complex(t1 - t2, t3 - t1 - t2)
print(jax.jit(lambda a, b: mm(a, b).real.sum())(a, b))
""",
    "c128_mul": """
import jax, jax.numpy as jnp
x = jnp.ones(128, jnp.complex128)
print(jax.jit(lambda x: (x * x).real.sum())(x))
""",
    "f64_matmul": """
import jax, jax.numpy as jnp
a = jnp.ones((64, 81), jnp.float64)
print(jax.jit(lambda a: (a @ a.T).sum())(a))
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
            [sys.executable, "-c", "import boxtree_tpu\n" + code],
            capture_output=True, text=True, timeout=600)
        tail = (proc.stdout.strip().splitlines() or [""])[-1:]
        err = ""
        if proc.returncode != 0:
            lines = proc.stderr.strip().splitlines()
            err = lines[-1][:200] if lines else "?"
        print(json.dumps({
            "probe": name, "rc": proc.returncode,
            "t": round(time.monotonic() - t, 1),
            "out": tail, "err": err}), flush=True)


if __name__ == "__main__":
    os.environ.setdefault("BOXTREE_TPU_CACHE",
                          os.path.expanduser("~/.cache/jax_tpu"))
    main()
