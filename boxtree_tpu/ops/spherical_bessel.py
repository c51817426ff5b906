"""Spherical Bessel functions j_n, y_n on device (pure jnp).

TPU-native replacement for host scipy callbacks (the reference reaches
Helmholtz radial functions through Fortran pyfmmlib;
``boxtree/pyfmmlib_integration.py``):

- ``y_n``: stable UPWARD recurrence
  ``y_{n+1} = (2n+1)/x * y_n - y_{n-1}`` (y grows with n, so forward is
  stable).
- ``j_n``: downward continued-fraction ratios (Miller's method in ratio
  form, overflow-free): ``r_n = j_n/j_{n-1} = 1/((2n+1)/x - r_{n+1})``
  seeded well above the requested order, then
  ``j_n = j_0 * prod(r_1..r_n)`` with ``j_0 = sin(x)/x``.

Both are differentiable jnp programs (the dipole path JVPs through
them).  Small arguments switch to the leading series term.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _double_factorial(n):
    return float(np.prod(np.arange(n, 0, -2), dtype=np.float64)) or 1.0


def spherical_jn(x, p, *, extra=25):
    """j_n(x) for n = 0..p; returns shape ``x.shape + (p+1,)``."""
    x = jnp.asarray(x)
    small = jnp.abs(x) < 1e-6
    xs = jnp.where(small, 1.0, x)
    xinv = 1.0 / xs

    nstart = p + extra
    # downward ratio recurrence r_n = j_n / j_{n-1}
    r = xs / (2 * nstart + 3)              # asymptotic seed r_{nstart+1}
    ratios = [None] * (p + 1)
    for n in range(nstart, 0, -1):
        denom = (2 * n + 1) * xinv - r
        denom = jnp.where(jnp.abs(denom) < 1e-300, 1e-300, denom)
        r = 1.0 / denom
        if n <= p:
            ratios[n] = r

    j0 = jnp.sin(xs) * xinv
    vals = [j0]
    for n in range(1, p + 1):
        vals.append(vals[n - 1] * ratios[n])
    out = jnp.stack(vals, axis=-1)

    # small-x leading term: j_n(x) ~ x^n / (2n+1)!!
    series = jnp.stack(
        [(x ** n) / _double_factorial(2 * n + 1) for n in range(p + 1)],
        axis=-1)
    return jnp.where(small[..., None], series, out)


def spherical_yn(x, p):
    """y_n(x) for n = 0..p (upward recurrence); shape ``x.shape+(p+1,)``.
    Not valid at x == 0 (y_n is singular there); callers guard r=0."""
    x = jnp.asarray(x)
    xs = jnp.where(x == 0, 1.0, x)
    xinv = 1.0 / xs
    y0 = -jnp.cos(xs) * xinv
    vals = [y0]
    if p >= 1:
        y1 = (-jnp.cos(xs) * xinv - jnp.sin(xs)) * xinv
        vals.append(y1)
        for n in range(1, p):
            vals.append((2 * n + 1) * xinv * vals[n] - vals[n - 1])
    return jnp.stack(vals, axis=-1)


def spherical_hn1(x, p):
    """h^(1)_n(x) = j_n(x) + i y_n(x) for n = 0..p."""
    return spherical_jn(x, p) + 1j * spherical_yn(x, p)
