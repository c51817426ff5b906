"""Cylindrical Bessel functions J_n, Y_n on device (pure jnp).

TPU-native replacement for the 2D Helmholtz wrangler's scipy host
callback (the reference reaches these through Fortran pyfmmlib;
``boxtree/pyfmmlib_integration.py``).  Same playbook as
:mod:`boxtree_tpu.ops.spherical_bessel`:

- ``J_n``: Miller's downward recurrence in ratio form
  (``r_n = J_n/J_{n-1} = 1/(2n/x - r_{n+1})``, overflow-free), seeded
  well above ``max(p, x)``, normalized with the Neumann identity
  ``J_0 + 2 sum_{k>=1} J_{2k} = 1`` (no closed form for ``J_0`` exists,
  unlike the spherical ``j_0 = sin x / x``).
- ``Y_0``, ``Y_1``: log-series in the already-computed ``J`` values
  (Abramowitz & Stegun 9.1.88/89 and the derivative of the first; no
  division by ``J_0``, so zeros of ``J_0`` are harmless)::

      Y_0 = (2/pi)[(ln(x/2)+g) J_0 + 2 sum_k (-1)^{k+1} J_{2k}/k]
      Y_1 = -Y_0' = (2/pi)[(ln(x/2)+g) J_1 - J_0/x
                           - sum_k (-1)^{k+1} (J_{2k-1}-J_{2k+1})/k]

- ``Y_n``: stable UPWARD recurrence ``Y_{n+1} = (2n/x) Y_n - Y_{n-1}``
  (Y grows with n).

Everything is differentiable jnp (the dipole path JVPs through the
basis via ``dF_n/dx = (F_{n-1} - F_{n+1})/2``).  Small arguments switch
``J_n`` to the leading series term; ``Y_n`` is singular at 0 and callers
guard ``r == 0``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EULER_GAMMA = 0.5772156649015328606


def miller_start(p, xmax):
    """Static downward-recurrence start order for ``J_n`` accurate to
    ~1e-15 at ``n <= p``, ``x <= xmax`` (Numerical Recipes rule of
    thumb: ``sqrt(40 n)`` above the larger of order and argument)."""
    n_eff = max(int(p), int(np.ceil(xmax)), 1)
    return n_eff + int(np.sqrt(40.0 * n_eff)) + 12


def cylindrical_jy(x, p, *, nstart):
    """``J_n(x)`` and ``Y_n(x)`` for ``n = 0..p``; returns two arrays of
    shape ``x.shape + (p+1,)``.

    :arg nstart: static start order of the downward recurrence; use
        :func:`miller_start` with an upper bound on ``|x|``.  ``Y`` is
        garbage where ``x <= 0`` (callers mask)."""
    x = jnp.asarray(x)
    small = jnp.abs(x) < 1e-8
    xs = jnp.where(small, 1.0, x)
    xinv = 1.0 / xs

    nstart = max(int(nstart), p + 2, 3)
    if nstart % 2:
        nstart += 1                       # even: pairs up the sums

    # downward ratio recurrence r_n = J_n / J_{n-1}
    r = xs / (2.0 * (nstart + 1))         # asymptotic seed r_{nstart+1}
    ratios = [None] * (nstart + 1)
    for n in range(nstart, 0, -1):
        denom = 2.0 * n * xinv - r
        denom = jnp.where(jnp.abs(denom) < 1e-300,
                          jnp.where(denom < 0, -1e-300, 1e-300), denom)
        r = 1.0 / denom
        ratios[n] = r

    # cumulative products P_n = J_n / J_0
    prods = [jnp.ones_like(xs)]
    for n in range(1, nstart + 1):
        prods.append(prods[n - 1] * ratios[n])

    # Neumann normalization S = J_0 + 2 sum_k J_{2k} = 1 and the two Y
    # log-series sums, all relative to J_0
    s_norm = jnp.ones_like(xs)
    s_y0 = jnp.zeros_like(xs)
    s_y1 = jnp.zeros_like(xs)
    for k in range(1, nstart // 2 + 1):
        sign = 1.0 if k % 2 == 1 else -1.0
        s_norm = s_norm + 2.0 * prods[2 * k]
        s_y0 = s_y0 + (sign / k) * prods[2 * k]
        if 2 * k + 1 <= nstart:
            s_y1 = s_y1 + (sign / k) * (prods[2 * k - 1]
                                        - prods[2 * k + 1])

    j0 = 1.0 / s_norm
    jvals = [prods[n] * j0 for n in range(p + 1)]
    j = jnp.stack(jvals, axis=-1)

    # small-x leading term: J_n(x) ~ (x/2)^n / n!
    fact = np.cumprod(np.concatenate([[1.0], np.arange(1.0, p + 1)]))
    series = jnp.stack(
        [(x * 0.5) ** n / fact[n] for n in range(p + 1)], axis=-1)
    j = jnp.where(small[..., None], series, j)

    logterm = jnp.log(0.5 * xs) + _EULER_GAMMA
    c = 2.0 / np.pi
    y0 = c * (logterm + 2.0 * s_y0) * j0
    yvals = [y0]
    if p >= 1:
        y1 = c * (logterm * prods[1] - xinv - s_y1) * j0
        yvals.append(y1)
        for n in range(1, p):
            yvals.append(2.0 * n * xinv * yvals[n] - yvals[n - 1])
    y = jnp.stack(yvals, axis=-1)
    return j, y
