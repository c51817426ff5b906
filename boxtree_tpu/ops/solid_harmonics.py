"""Complex solid harmonics for the 3D Laplace FMM.

Scaled regular/irregular solid harmonics (Dehnen-style normalization,
which makes every translation a plain spherical convolution with no
factorial coupling coefficients):

- regular:   ``R_n^m(x) = rho^n  P_n^|m|(cos th) e^{i m phi} / (n+|m|)!``
- irregular: ``S_n^m(x) = (n-|m|)! P_n^|m|(cos th) e^{i m phi} / rho^{n+1}``

with ``R_n^{-m} = (-1)^m conj(R_n^m)`` (same for S).  Both are computed by
stable Cartesian recurrences (no trig):

- ``R_m^m = (x + iy) R_{m-1}^{m-1} / (2m)``
- ``R_{m+1}^m = z R_m^m``
- ``R_n^m = ((2n-1) z R_{n-1}^m - r^2 R_{n-2}^m) / ((n+m)(n-m))``
- ``S_m^m = (2m-1) (x + iy) S_{m-1}^{m-1} / r^2``   (``S_0^0 = 1/r``)
- ``S_{m+1}^m = (2m+1) z S_m^m / r^2``
- ``S_n^m = ((2n-1) z S_{n-1}^m - ((n-1)^2 - m^2) S_{n-2}^m) / r^2``

Key identity (for ``|y| < |x|``), which fixes all sign conventions and is
unit-tested against brute force::

    1/|x - y| = sum_{n=0..inf} sum_{m=-n..n} conj(R_n^m(y)) S_n^m(x)

Coefficient layout: ``(n, m) -> n*n + n + m`` in a length-``(p+1)^2``
vector (m from -n to n).
"""

from __future__ import annotations

import numpy as np


def nm_index(n, m):
    return n * n + n + m


def ncoeffs(p):
    return (p + 1) * (p + 1)


def _harmonics(xp, coords, p, kind):
    """Compute R (kind='regular') or S (kind='irregular') for all
    (n, m) with 0 <= n <= p, -n <= m <= n.

    :arg coords: (3, ...) array.
    :returns: complex array of shape ``(...,) + (ncoeffs,)``.
    """
    x, y, z = coords[0], coords[1], coords[2]
    r2 = x * x + y * y + z * z
    u = x + 1j * y

    shape = x.shape
    # complex64 for float32 coords, complex128 for float64
    cdtype = xp.result_type(x.dtype, xp.complex64)
    vals = [None] * ncoeffs(p)

    if kind == "regular":
        # R_m^m chain
        rmm = xp.ones(shape, dtype=cdtype)
        vals[nm_index(0, 0)] = rmm
        for m in range(1, p + 1):
            rmm = u * rmm / (2 * m)
            vals[nm_index(m, m)] = rmm
        # upward in n for each m
        for m in range(0, p + 1):
            prev2 = None
            prev1 = vals[nm_index(m, m)]
            for n in range(m + 1, p + 1):
                if n == m + 1:
                    cur = z * prev1
                else:
                    cur = ((2 * n - 1) * z * prev1 - r2 * prev2) \
                        / ((n + m) * (n - m))
                vals[nm_index(n, m)] = cur
                prev2, prev1 = prev1, cur
    else:
        rinv2 = 1.0 / r2
        rinv = xp.sqrt(rinv2)
        smm = rinv.astype(cdtype)
        vals[nm_index(0, 0)] = smm
        for m in range(1, p + 1):
            smm = (2 * m - 1) * u * smm * rinv2
            vals[nm_index(m, m)] = smm
        for m in range(0, p + 1):
            prev2 = None
            prev1 = vals[nm_index(m, m)]
            for n in range(m + 1, p + 1):
                if n == m + 1:
                    cur = (2 * n - 1) * z * prev1 * rinv2
                else:
                    cur = ((2 * n - 1) * z * prev1
                           - ((n - 1) * (n - 1) - m * m) * prev2) * rinv2
                vals[nm_index(n, m)] = cur
                prev2, prev1 = prev1, cur

    # negative m by symmetry
    for n in range(p + 1):
        for m in range(1, n + 1):
            vals[nm_index(n, -m)] = ((-1) ** m) * xp.conj(
                vals[nm_index(n, m)])

    return xp.stack(vals, axis=-1)


def regular(coords, p, xp=np):
    """Regular solid harmonics R_n^m; see module docstring."""
    return _harmonics(xp, coords, p, "regular")


def irregular(coords, p, xp=np):
    """Irregular (singular) solid harmonics S_n^m."""
    return _harmonics(xp, coords, p, "irregular")


# {{{ real-pair evaluation (complex-free device code)

def _harmonics_pairs(xp, coords, p, kind):
    """Same recurrences as :func:`_harmonics`, carrying explicit
    ``(re, im)`` real pairs instead of complex scalars.  Needed on
    accelerator backends without complex-arithmetic support (the
    tunneled TPU rejects every complex op as UNIMPLEMENTED), and the
    natural representation for the MXU anyway: downstream translation
    operators act on the ``[re | im]`` vector as plain real matmuls.

    :returns: real array of shape ``(...,) + (2 * ncoeffs,)`` laid out
        ``[Re(vals) | Im(vals)]`` in the ``(n, m) -> n*n + n + m``
        coefficient order of :func:`_harmonics`.
    """
    x, y, z = coords[0], coords[1], coords[2]
    r2 = x * x + y * y + z * z

    shape = x.shape
    nc = ncoeffs(p)
    re = [None] * nc
    im = [None] * nc

    def umul(ar, ai):
        # (ar + i ai) * (x + i y)
        return ar * x - ai * y, ar * y + ai * x

    if kind == "regular":
        rr, ri = xp.ones(shape, x.dtype), xp.zeros(shape, x.dtype)
        re[nm_index(0, 0)], im[nm_index(0, 0)] = rr, ri
        for m in range(1, p + 1):
            rr, ri = umul(rr, ri)
            rr, ri = rr / (2 * m), ri / (2 * m)
            re[nm_index(m, m)], im[nm_index(m, m)] = rr, ri
        for m in range(0, p + 1):
            p2r = p2i = None
            p1r, p1i = re[nm_index(m, m)], im[nm_index(m, m)]
            for n in range(m + 1, p + 1):
                if n == m + 1:
                    cr, ci = z * p1r, z * p1i
                else:
                    den = (n + m) * (n - m)
                    cr = ((2 * n - 1) * z * p1r - r2 * p2r) / den
                    ci = ((2 * n - 1) * z * p1i - r2 * p2i) / den
                re[nm_index(n, m)], im[nm_index(n, m)] = cr, ci
                p2r, p2i, p1r, p1i = p1r, p1i, cr, ci
    else:
        rinv2 = 1.0 / r2
        rinv = xp.sqrt(rinv2)
        sr, si = rinv, xp.zeros(shape, x.dtype)
        re[nm_index(0, 0)], im[nm_index(0, 0)] = sr, si
        for m in range(1, p + 1):
            sr, si = umul(sr, si)
            sr = (2 * m - 1) * sr * rinv2
            si = (2 * m - 1) * si * rinv2
            re[nm_index(m, m)], im[nm_index(m, m)] = sr, si
        for m in range(0, p + 1):
            p2r = p2i = None
            p1r, p1i = re[nm_index(m, m)], im[nm_index(m, m)]
            for n in range(m + 1, p + 1):
                if n == m + 1:
                    cr = (2 * n - 1) * z * p1r * rinv2
                    ci = (2 * n - 1) * z * p1i * rinv2
                else:
                    c2 = (n - 1) * (n - 1) - m * m
                    cr = ((2 * n - 1) * z * p1r - c2 * p2r) * rinv2
                    ci = ((2 * n - 1) * z * p1i - c2 * p2i) * rinv2
                re[nm_index(n, m)], im[nm_index(n, m)] = cr, ci
                p2r, p2i, p1r, p1i = p1r, p1i, cr, ci

    # negative m: (-1)^m * conj
    for n in range(p + 1):
        for m in range(1, n + 1):
            s = (-1.0) ** m
            re[nm_index(n, -m)] = s * re[nm_index(n, m)]
            im[nm_index(n, -m)] = -s * im[nm_index(n, m)]

    return xp.stack(re + im, axis=-1)


def regular_pairs(coords, p, xp=np):
    """Regular solid harmonics as ``[re | im]`` real pairs."""
    return _harmonics_pairs(xp, coords, p, "regular")


def irregular_pairs(coords, p, xp=np):
    """Irregular solid harmonics as ``[re | im]`` real pairs."""
    return _harmonics_pairs(xp, coords, p, "irregular")


def pair_matrix(mat, xp=np):
    """Expand a complex (K, K) operator (or an (..., K, K) stack) into
    the real (2K, 2K) operator acting on ``[re | im]`` coefficient
    vectors: ``[[Re M, -Im M], [Im M, Re M]]`` in the column (``y = M
    x``) convention."""
    mr, mi = xp.real(mat), xp.imag(mat)
    top = xp.concatenate([mr, -mi], axis=-1)
    bot = xp.concatenate([mi, mr], axis=-1)
    return xp.concatenate([top, bot], axis=-2)

# }}}
