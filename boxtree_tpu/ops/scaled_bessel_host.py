"""Host-side rscale-scaled Bessel evaluations (numpy, scalar argument).

The deep-tree-stable Helmholtz operator builders need the products

    Jhat_q(x; s) = J_q(x) * s**-q        (cylindrical, and spherical j)
    Yhat_q(x; s) = Y_q(x) * s**+q        (cylindrical, and spherical y)

for q = 0..qmax with s ~ x (the per-level ``rscale``).  Forming the
factors separately overflows float64 long before the products do
(``Y_70(1e-4) ~ 1e399``), which is why the reference's pyfmmlib passes
``rscale`` directly into its Fortran recurrences
(``boxtree/pyfmmlib_integration.py:393-402``, ``rscale`` arguments of
every h2d/h3d routine).  Here the scaling is folded into the
recurrences themselves:

- ``Yhat``: the upward recurrence ``Y_{q+1} = (2q/x) Y_q - Y_{q-1}``
  becomes ``Yhat_{q+1} = (2q/x) s Yhat_q - s^2 Yhat_{q-1}`` (stable
  upward: Y grows with q).
- ``Jhat``: Miller's downward ratio recurrence gives the true ratios
  ``r_q = J_q / J_{q-1}``; the scaled relative values
  ``Jhat_q / J_0 = prod (r_m / s)`` stay representable (each factor is
  ``O(x / (2 m s)) = O(1/m)``), and the Neumann sum
  ``J_0 (1 + 2 sum_k (Jhat_{2k}/J_0) s^{2k}) = 1`` normalizes without
  evaluating any unscaled ``J_q``.

Spherical versions use the ``(2q+1)/x`` recurrence coefficient and
anchor the Miller normalization on ``j_0 = sin x / x`` or ``j_1``
(whichever is better conditioned).
"""

from __future__ import annotations

import numpy as np

from boxtree_tpu.ops.cylinder_bessel import miller_start


def _miller_values(x, qmax, coeff, s):
    """Unnormalized downward Miller values ``Fhat_q ~ A * F_q * s**-q``
    for the recurrence ``F_{q-1} = coeff(q) F_q - F_{q+1}`` (coeff:
    2q/x cylindrical, (2q+1)/x spherical), q = 0..qmax.

    Running on VALUES (not ratios) keeps accuracy through interior
    zeros of F — a near-zero ``F_m`` makes the ratio ``F_{m+1}/F_m``
    catastrophically cancel, poisoning every product through it, while
    the value recurrence only ever adds/subtracts well-scaled terms.
    The array is renormalized in place when it grows past 1e250 (the
    caller divides by an anchor, so the overall constant is free)."""
    nstart = miller_start(qmax, abs(x)) + 8
    out = np.zeros(max(qmax, 1) + 1)
    f_hi = 0.0                       # Fhat_{q+1}
    f = 1e-250                       # Fhat_q at q = nstart
    if nstart <= qmax:
        out[nstart] = f
    for q in range(nstart, 0, -1):
        f_lo = coeff(q) * s * f - (s * s) * f_hi
        f_hi, f = f, f_lo
        if abs(f) > 1e250:
            f *= 1e-250
            f_hi *= 1e-250
            out *= 1e-250
        if q - 1 <= out.shape[0] - 1:
            out[q - 1] = f
    return out


def jv_scaled(x, qmax, s):
    """``J_q(x) * s**-q`` for q = 0..qmax (scalar x > 0, s > 0).

    Normalized by the Wronskian ``J_1 Y_0 - J_0 Y_1 = 2/(pi x)``, which
    stays well-conditioned at zeros of ``J_0`` (where a plain ``J_0``
    anchor divides by a near-zero)."""
    from scipy import special as sp
    x = float(x)
    f = _miller_values(x, qmax, lambda q: 2.0 * q / x, s)
    w = f[1] * s * sp.yv(0, x) - f[0] * sp.yv(1, x)
    alpha = (2.0 / (np.pi * x)) / w
    return f[:qmax + 1] * alpha


def yv_scaled(x, qmax, s):
    """``Y_q(x) * s**+q`` for q = 0..qmax."""
    from scipy import special as sp
    x = float(x)
    out = np.empty(qmax + 1)
    out[0] = sp.yv(0, x)
    if qmax >= 1:
        out[1] = sp.yv(1, x) * s
        for q in range(1, qmax):
            out[q + 1] = (2.0 * q / x) * s * out[q] - s * s * out[q - 1]
    return out


def hankel1_scaled(x, qmax, s):
    """``H^(1)_q(x) * s**+q``: the J part underflows harmlessly against
    the dominant scaled Y part."""
    jpart = jv_scaled(x, qmax, 1.0) * np.power(
        float(s), np.arange(qmax + 1, dtype=np.float64))
    return jpart + 1j * yv_scaled(x, qmax, s)


def spherical_jn_scaled(x, qmax, s):
    """``j_q(x) * s**-q`` for q = 0..qmax.

    Wronskian-normalized (``j_1 y_0 - j_0 y_1 = 1/x^2``) for the same
    conditioning reason as :func:`jv_scaled`."""
    x = float(x)
    f = _miller_values(x, qmax, lambda q: (2.0 * q + 1.0) / x, s)
    y0 = -np.cos(x) / x
    y1 = -np.cos(x) / x ** 2 - np.sin(x) / x
    w = f[1] * s * y0 - f[0] * y1
    alpha = (1.0 / x ** 2) / w
    return f[:qmax + 1] * alpha


def spherical_yn_scaled(x, qmax, s):
    """``y_q(x) * s**+q`` for q = 0..qmax."""
    x = float(x)
    out = np.empty(qmax + 1)
    out[0] = -np.cos(x) / x
    if qmax >= 1:
        out[1] = (-np.cos(x) / x ** 2 - np.sin(x) / x) * s
        for q in range(1, qmax):
            out[q + 1] = ((2.0 * q + 1.0) / x) * s * out[q] \
                - s * s * out[q - 1]
    return out


def spherical_hn1_scaled(x, qmax, s):
    """``h^(1)_q(x) * s**+q``."""
    jpart = spherical_jn_scaled(x, qmax, 1.0) * np.power(
        float(s), np.arange(qmax + 1, dtype=np.float64))
    return jpart + 1j * spherical_yn_scaled(x, qmax, s)
