"""Golden-value validation of the Savitzky-Golay implementation.

scipy is not installed in this environment, so parity with
``scipy.signal.savgol_filter(mode='interp')`` (the reference's call,
instants.py:76) is pinned two independent ways:

1. The PUBLISHED Savitzky-Golay convolution coefficients (Savitzky &
   Golay 1964, with the Steinier 1972 corrections — the classic
   integer tables every implementation, scipy included, reproduces).
2. An EXACT-RATIONAL re-derivation: least-squares polynomial fits
   solved over ``fractions.Fraction`` normal equations (Gaussian
   elimination, no floating point, no numpy) — independent of the
   ``np.linalg.pinv`` path used by the implementation. This covers
   interior taps, the mode='interp' edge maps, full-signal output,
   and the short-record global-fit degradation.
"""

from fractions import Fraction
from math import factorial

import numpy as np
import pytest

from tabata_spark.operators.savgol import (
    savgol_coeffs,
    savgol_edge_matrix,
    savgol_filter_np,
)


# ------------------------------------------------- exact rational LSQ


def _solve(A, b):
    """Gaussian elimination over Fractions (exact)."""
    n = len(A)
    M = [list(row) + [b[i]] for i, row in enumerate(A)]
    for col in range(n):
        piv = next(r for r in range(col, n) if M[r][col] != 0)
        M[col], M[piv] = M[piv], M[col]
        pv = M[col][col]
        M[col] = [x / pv for x in M[col]]
        for r in range(n):
            if r != col and M[r][col] != 0:
                f = M[r][col]
                M[r] = [x - f * y for x, y in zip(M[r], M[col])]
    return [M[r][n] for r in range(n)]


def exact_fit_eval(xs, ys, order, x0, deriv):
    """deriv-th derivative at x0 of the exact least-squares polynomial
    of ``order`` through (xs, ys) — all Fraction arithmetic."""
    xs = [Fraction(x) for x in xs]
    ys = [Fraction(y) for y in ys]
    A = [
        [sum(x ** (j + k) for x in xs) for k in range(order + 1)]
        for j in range(order + 1)
    ]
    b = [sum(y * x**j for x, y in zip(xs, ys)) for j in range(order + 1)]
    a = _solve(A, b)
    x0 = Fraction(x0)
    return sum(
        a[j] * Fraction(factorial(j), factorial(j - deriv)) * x0 ** (j - deriv)
        for j in range(deriv, order + 1)
    )


def exact_interp_filter(ys, width, order, deriv):
    """Exact-rational replica of scipy savgol_filter(mode='interp')."""
    n = len(ys)
    h = width // 2
    if n < width:
        d = min(order, n - 1)
        return [exact_fit_eval(range(n), ys, d, i, deriv) for i in range(n)]
    out = []
    for i in range(n):
        if i < h:
            out.append(exact_fit_eval(range(width), ys[:width], order, i, deriv))
        elif i > n - 1 - h:
            xs = range(n - width, n)
            out.append(exact_fit_eval(xs, ys[-width:], order, i, deriv))
        else:
            xs = range(-h, h + 1)
            win = ys[i - h : i + h + 1]
            out.append(exact_fit_eval(xs, win, order, 0, deriv))
    return out


# ------------------------------------------------- published tables

# (width, order, deriv) -> (integer taps, divisor); window ordered
# [y[i-h] .. y[i+h]].  Savitzky & Golay 1964 (Steinier-corrected).
PUBLISHED = {
    (5, 2, 0): ([-3, 12, 17, 12, -3], 35),
    (7, 2, 0): ([-2, 3, 6, 7, 6, 3, -2], 21),
    (9, 2, 0): ([-21, 14, 39, 54, 59, 54, 39, 14, -21], 231),
    (5, 3, 1): ([1, -8, 0, 8, -1], 12),
    (5, 2, 1): ([-2, -1, 0, 1, 2], 10),
    (7, 2, 1): ([-3, -2, -1, 0, 1, 2, 3], 28),
    (5, 2, 2): ([2, -1, -2, -1, 2], 7),
    (7, 2, 2): ([5, 0, -3, -4, -3, 0, 5], 42),
}


@pytest.mark.parametrize("key", sorted(PUBLISHED))
def test_coeffs_match_published_tables(key):
    width, order, deriv = key
    taps, div = PUBLISHED[key]
    want = np.array(taps, dtype=float) / div
    got = np.array(savgol_coeffs(width, order, deriv))
    np.testing.assert_allclose(got, want, atol=1e-12)


# ------------------------------------------------- exact-rational pins


@pytest.mark.parametrize(
    "width,order,deriv",
    [(5, 2, 0), (7, 2, 1), (9, 3, 0), (11, 2, 2), (21, 3, 2), (41, 2, 0)],
)
def test_coeffs_match_exact_rational(width, order, deriv):
    h = width // 2
    got = savgol_coeffs(width, order, deriv)
    for k in range(width):
        e_k = [1 if i == k else 0 for i in range(width)]
        want = exact_fit_eval(range(-h, h + 1), e_k, order, 0, deriv)
        assert abs(got[k] - float(want)) < 1e-10, (k, got[k], want)


@pytest.mark.parametrize("width,order,deriv", [(5, 2, 0), (11, 2, 1), (21, 3, 2)])
def test_edge_matrix_matches_exact_rational(width, order, deriv):
    h = width // 2
    E = savgol_edge_matrix(width, order, deriv)
    for p in range(h):
        for k in range(width):
            e_k = [1 if i == k else 0 for i in range(width)]
            want = exact_fit_eval(range(width), e_k, order, p, deriv)
            assert abs(E[p][k] - float(want)) < 1e-10, (p, k)


@pytest.mark.parametrize(
    "n,width,order,deriv",
    [(15, 7, 2, 0), (15, 7, 2, 1), (20, 11, 3, 0), (9, 5, 2, 2), (4, 7, 2, 0), (2, 5, 2, 1)],
)
def test_full_signal_matches_exact_interp(n, width, order, deriv):
    """End-to-end mode='interp' parity on a deterministic non-smooth
    signal, including edges and the short-record (n < width) global
    fit."""
    rng = np.random.default_rng(7)
    ys = [int(v) for v in rng.integers(-50, 50, size=n)]
    want = [float(v) for v in exact_interp_filter(ys, width, order, deriv)]
    got = savgol_filter_np(np.array(ys, dtype=float), width, order, deriv)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
