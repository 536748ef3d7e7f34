"""Savitzky-Golay filtering — reference W5, the workhorse window op.

The reference calls ``scipy.signal.savgol_filter(y, width, deg,
deriv)`` everywhere (instants.py:76 indicator smoothing, 284-291 noise
estimation, 534-537 belief smoothing; tubes.py:344-351 tube
smoothing). SG filtering is a linear FIR: the smoothed/derived value is
a fixed dot product of the surrounding window, with the coefficients
given by a least-squares polynomial fit — so the *interior* is a pure
``Window.rowsBetween(-h, h)`` expression chain (JVM-side, codegen),
and the *edges* under scipy's default ``mode='interp'`` are another
fixed linear map of the first/last ``width`` samples (a polynomial fit
to the edge window evaluated at the edge positions) — also expressible
natively because only ``h`` rows per side need it.

No scipy in this environment: coefficients are derived here from first
principles (pinv of the Vandermonde design matrix), and
``savgol_filter_np`` is the numpy reference/oracle replicating scipy's
``mode='interp'`` semantics.

Two execution paths:
- ``savgol_native``: lag/lead dot product + edge correction, fully
  JVM-side — the 100 TB path (no Python, no Arrow, no optimization
  barrier; ~3*width window expressions, use for width ≲ 64);
- ``savgol_apply``: Arrow-batched ``applyInPandas`` per record calling
  the numpy kernel — for very wide filters or many columns at once.
"""

from __future__ import annotations

from functools import lru_cache
from math import factorial

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- design


@lru_cache(maxsize=256)
def savgol_coeffs(width: int, polyorder: int, deriv: int = 0, delta: float = 1.0) -> tuple:
    """FIR taps c such that out[i] = sum_k c[k] * y[i - h + k].

    Least-squares fit of a degree-``polyorder`` polynomial on the
    centered window, evaluated (``deriv``-th derivative) at the center.
    Matches scipy.signal.savgol_coeffs(..., use='dot') for odd widths.
    """
    if width % 2 != 1:
        raise ValueError("width must be odd")
    if polyorder >= width:
        raise ValueError("polyorder must be < width")
    h = width // 2
    x = np.arange(-h, h + 1, dtype=float)
    # V[k, j] = x_k^j ; fitted poly coeffs a = pinv(V) @ y
    V = np.vander(x, polyorder + 1, increasing=True)
    pinv = np.linalg.pinv(V)
    c = pinv[deriv] * factorial(deriv) / (delta**deriv)
    return tuple(c)


@lru_cache(maxsize=256)
def savgol_edge_matrix(
    width: int, polyorder: int, deriv: int = 0, delta: float = 1.0
) -> tuple:
    """Head-edge linear map E (h x width): out[j] = E[j] @ y[:width].

    scipy ``mode='interp'``: fit one polynomial to the first ``width``
    samples, evaluate its ``deriv``-th derivative at positions
    0..h-1. The tail edge is the same map under reversal with sign
    (-1)^deriv (odd derivatives flip under coordinate reversal).
    Returned as a tuple of row-tuples for hashability.
    """
    h = width // 2
    x = np.arange(width, dtype=float)
    V = np.vander(x, polyorder + 1, increasing=True)
    pinv = np.linalg.pinv(V)  # y -> poly coeffs a_j
    # derivative evaluation row at position p: sum_j a_j * d^deriv/dx^deriv x^j |_p
    rows = []
    for p in range(h):
        ev = np.zeros(polyorder + 1)
        for j in range(deriv, polyorder + 1):
            ev[j] = (factorial(j) / factorial(j - deriv)) * (float(p) ** (j - deriv))
        rows.append(tuple((ev @ pinv) / (delta**deriv)))
    return tuple(rows)


def savgol_filter_np(
    y: np.ndarray, width: int, polyorder: int, deriv: int = 0, delta: float = 1.0
) -> np.ndarray:
    """Numpy reference implementation (scipy savgol_filter parity,
    mode='interp'). Oracle for both Spark paths; also used by the
    applyInPandas path."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    if n < width:
        # degenerate record: single global polynomial fit (scipy raises;
        # we degrade gracefully — fit to whole record)
        x = np.arange(n, dtype=float)
        order = min(polyorder, max(n - 1, 0))
        V = np.vander(x, order + 1, increasing=True)
        a = np.linalg.pinv(V) @ y
        out = np.zeros(n)
        for j in range(deriv, order + 1):
            out += a[j] * (factorial(j) / factorial(j - deriv)) * x ** (j - deriv)
        return out / (delta**deriv)
    h = width // 2
    c = np.array(savgol_coeffs(width, polyorder, deriv, delta))
    # interior: correlation (flip for np.convolve's kernel reversal)
    full = np.convolve(y, c[::-1], mode="same")
    out = full.copy()
    E = np.array(savgol_edge_matrix(width, polyorder, deriv, delta))
    if h > 0:
        out[:h] = E @ y[:width]
        out[-h:] = ((-1.0) ** deriv) * (E @ y[-width:][::-1])[::-1]
    return out


# ---------------------------------------------------------------- native


def _record_w() -> Window:
    return Window.partitionBy("record_id").orderBy("seq")


def _record_frame() -> Window:
    return _record_w().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)


def savgol_native(
    df: DataFrame,
    col: str,
    out: str,
    width: int,
    polyorder: int = 2,
    deriv: int = 0,
    delta: float = 1.0,
    edges: bool = True,
) -> DataFrame:
    """Fully JVM-side SG filter with interp edges.

    interior[i] = sum_k c_k * y[i-h+k]             (lag/lead chain)
    head[j]     = E[j] @ first ``width`` values    (per-record edge map)
    tail[j]     = reversed head under sign flip

    The fact table sees exactly one shuffle (the record window); the
    edge values come from a filtered O(records·width) side frame,
    reduced to a per-record {seq -> value} map and broadcast-joined
    back — the side aggregations shuffle only the tiny side.
    """
    h = width // 2
    c = savgol_coeffs(width, polyorder, deriv, delta)
    y = F.col(f"`{col}`").cast("double")
    w = _record_w()
    frame = _record_frame()

    pos = F.row_number().over(w) - F.lit(1)  # LEN
    n = F.count(F.lit(1)).over(frame)
    rev = n - F.lit(1) - pos  # rows from end

    # out[i] = sum_k c_k * y[i - h + k]; lag(y, off) reads y[i - off],
    # so the tap at window slot k needs off = h - k
    interior = sum(
        (F.lit(float(ck)) * F.lag(y, h - k).over(w) for k, ck in enumerate(c)),
        F.lit(0.0),
    )

    if not edges:
        # interior-only (edge rows null): skips the edge machinery —
        # use when downstream filters to interior
        expr = F.when(
            (n >= F.lit(width)) & (pos >= h) & (rev >= h), interior
        )
        return df.withColumn(out, expr)

    # Edge values (mode='interp') depend only on the first/last
    # ``width`` samples of each record. Computing them as 2*width
    # conditional window aggregates costs per-ROW work across the whole
    # table; instead build a per-RECORD map {edge_seq -> value} on a
    # filtered small side and broadcast-join it back: zero extra
    # shuffles of the fact table, O(records) side state.
    # (Relies on the engine invariant: seq is dense 0..n-1 per record.)
    E = savgol_edge_matrix(width, polyorder, deriv, delta)
    sign = (-1.0) ** deriv

    src = df.select("record_id", "seq", y.alias("__y"))
    counts = src.groupBy("record_id").agg(F.count(F.lit(1)).alias("__n"))
    heads = (
        src.filter(F.col("seq") < width)
        .groupBy("record_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "__y"))), lambda s: s["__y"]
            ).alias("__hy")
        )
    )
    tails_src = src.join(F.broadcast(counts), "record_id").filter(
        F.col("seq") >= F.col("__n") - width
    )
    tails = tails_src.groupBy("record_id").agg(
        F.reverse(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "__y"))), lambda s: s["__y"]
            )
        ).alias("__ty")  # reversed: __ty[k] = y[n-1-k]
    )

    def dot(arr, row, scale=1.0):
        return sum(
            (F.lit(scale * float(row[k])) * F.element_at(arr, k + 1) for k in range(width)),
            F.lit(0.0),
        )

    keys, vals = [], []
    for j in range(h):
        keys.append(F.lit(j).cast("long"))
        vals.append(dot(F.col("__hy"), E[j]))
    for j in range(h):
        keys.append((F.col("__n") - 1 - F.lit(j)).cast("long"))
        vals.append(dot(F.col("__ty"), E[j], sign))
    edge_maps = (
        heads.join(tails, "record_id")
        .join(counts, "record_id")
        .filter(F.col("__n") >= width)
        .select(
            "record_id",
            F.col("__n").alias("__n"),
            F.map_from_arrays(F.array(*keys), F.array(*vals)).alias("__emap"),
        )
    )

    # Records SHORTER than ``width`` degrade to a single global
    # polynomial fit of degree min(polyorder, n-1) — numpy-oracle
    # semantics (savgol_filter_np). The fit is computed NATIVELY from
    # Gram-polynomial moments (closed-form normal equations on the
    # integer grid), so the whole plan stays JVM-side: four weighted
    # moments per short record, then a per-seq fitted-value map,
    # merged into the same broadcast edge map. Supported for
    # polyorder ≤ 3 (every reference/repo use); higher orders keep
    # the old behavior (short records → null).
    short_maps = None
    if polyorder <= 3:
        short_maps = _short_global_fit_maps(src, counts, width, polyorder, deriv, delta)

    side = edge_maps if short_maps is None else edge_maps.unionByName(short_maps)
    joined = df.join(F.broadcast(side), "record_id", "left")
    # try_element_at: missing key -> null (ANSI element_at would throw)
    edge_val = F.try_element_at(F.col("__emap"), F.col("seq"))
    expr = F.when(F.col("__n").isNotNull(), F.coalesce(edge_val, interior))
    return joined.withColumn(out, expr).drop("__emap", "__n")


def _short_global_fit_maps(
    src: DataFrame, counts: DataFrame, width: int, polyorder: int, deriv: int, delta: float
) -> DataFrame:
    """Per-record {seq -> value} maps for records with n < width: the
    single least-squares polynomial fit of degree min(polyorder, n-1),
    derived in closed form.

    On the integer grid 0..n-1 the discrete orthogonal (Gram) basis is
    φ0 = 1, φ1 = c (centered x), φ2 = c² − m2, φ3 = c³ − αc with
    m2 = (n²−1)/12, α = Σc⁴/Σc², and the power sums Σc², Σc⁴, Σc⁶
    are Faulhaber closed forms in n — so each fit coefficient is a
    ratio of two aggregate expressions and the whole computation is
    plain Column algebra over an O(records·width) side frame."""
    y = F.col("__y")
    s = F.col("seq").cast("double")
    moments = [F.sum(y * F.pow(s, j)).alias(f"__t{j}") for j in range(polyorder + 1)]
    agg = (
        src.join(
            F.broadcast(counts.filter(F.col("__n") < width).select("record_id")),
            "record_id",
        )
        .groupBy("record_id")
        .agg(F.count(F.lit(1)).alias("__n"), *moments)
    )

    n = F.col("__n").cast("double")
    xbar = (n - F.lit(1.0)) / F.lit(2.0)
    m2 = (n * n - 1) / F.lit(12.0)
    sc2 = n * (n * n - 1) / F.lit(12.0)
    sc4 = n * (n * n - 1) * (F.lit(3.0) * n * n - 7) / F.lit(240.0)
    sc6 = (
        n
        * (n * n - 1)
        * (F.lit(3.0) * F.pow(n, 4) - F.lit(18.0) * n * n + 31)
        / F.lit(1344.0)
    )
    alpha = F.when(F.col("__n") > 1, sc4 / sc2).otherwise(F.lit(0.0))

    t = [F.col(f"__t{j}") if j <= polyorder else F.lit(0.0) for j in range(4)]
    c1y = t[1] - xbar * t[0]
    phi2y = t[2] - 2 * xbar * t[1] + xbar * xbar * t[0] - m2 * t[0]
    phi3y = (
        t[3]
        - 3 * xbar * t[2]
        + 3 * xbar * xbar * t[1]
        - F.pow(xbar, 3) * t[0]
        - alpha * c1y
    )

    zero = F.lit(0.0)
    a0 = t[0] / n
    a1 = F.when(F.col("__n") > 1, c1y / sc2).otherwise(zero) if polyorder >= 1 else zero
    a2 = (
        F.when(F.col("__n") > 2, phi2y / (sc4 - n * m2 * m2)).otherwise(zero)
        if polyorder >= 2
        else zero
    )
    a3 = (
        F.when(F.col("__n") > 3, phi3y / (sc6 - sc4 * sc4 / sc2)).otherwise(zero)
        if polyorder >= 3
        else zero
    )

    def fitted(p):
        c = p.cast("double") - xbar
        if deriv == 0:
            v = a0 + a1 * c + a2 * (c * c - m2) + a3 * (F.pow(c, 3) - alpha * c)
        elif deriv == 1:
            v = a1 + 2 * a2 * c + a3 * (F.lit(3.0) * c * c - alpha)
        elif deriv == 2:
            v = 2 * a2 + F.lit(6.0) * a3 * c
        elif deriv == 3:
            v = F.lit(6.0) * a3
        else:  # deriv > polyorder of the global fit -> 0
            v = zero
        return v / F.lit(float(delta) ** deriv)

    seq_arr = F.sequence(F.lit(0).cast("long"), (F.col("__n") - 1).cast("long"))
    return agg.select(
        "record_id",
        "__n",
        F.map_from_arrays(seq_arr, F.transform(seq_arr, fitted)).alias("__emap"),
    )


# ----------------------------------------------------------- applyInPandas


def savgol_apply(
    df: DataFrame,
    specs: list[tuple[str, str, int, int, int]],
    delta: float = 1.0,
) -> DataFrame:
    """Arrow-batched per-record SG for many (col,out,width,order,deriv)
    specs at once — one grouped-map pass, amortizing the Arrow transfer
    across the whole filter grid (the M1 indicator fan-out computes
    hundreds of filtered columns; this path does them in one exchange).
    """
    import pandas as pd

    schema = T.StructType(
        list(df.schema)
        + [T.StructField(o, T.DoubleType()) for _, o, _, _, _ in specs]
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("seq")
        for colname, outname, width, order, deriv in specs:
            pdf[outname] = savgol_filter_np(
                pdf[colname].to_numpy(), width, order, deriv, delta
            )
        return pdf

    return df.groupBy("record_id").applyInPandas(fn, schema)


def savgol(
    df: DataFrame,
    col: str,
    out: str,
    width: int,
    polyorder: int = 2,
    deriv: int = 0,
    delta: float = 1.0,
    native_max_width: int = 65,
) -> DataFrame:
    """SG filter, picking the native path for moderate widths and the
    Arrow path for very wide kernels."""
    if width <= native_max_width:
        return savgol_native(df, col, out, width, polyorder, deriv, delta)
    return savgol_apply(df, [(col, out, width, polyorder, deriv)], delta)
