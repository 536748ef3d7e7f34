"""Exponentially weighted moving average over per-record signals
(reference W-family complement: SG smooths polynomially, EWMA smooths
recursively — the monitoring/trend smoother).

The exact recursion y_t = a·x_t + (1-a)·y_{t-1} has infinite memory —
a sequential scan, the one thing a distributed engine must not do per
record. The standard distributed form is the TRUNCATED KERNEL:

    y_t = sum_{k=0..L-1} (1-a)^k x_{t-k} / sum_{k in present} (1-a)^k

i.e. pandas ``ewm(alpha=a, adjust=True)`` restricted to an L-row
lookback. With (1-a)^L below ~1e-3 the truncation bias is negligible
and the operator becomes a fixed linear filter: L lag terms summed in
a fixed order inside one record-partitioned window — single shuffle on
record_id (shared with every other signal op), whole-stage codegen,
and bit-replayable by any engine that evaluates the same expression
(the DuckDB oracle is machine-generated from the same weights).

Edges (first L-1 rows of each record) renormalize over the weights
actually present — exactly pandas' ``adjust=True`` behavior, so the
head of the series is unbiased rather than damped toward zero.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ewma_weights(alpha: float, lookback: int) -> list[float]:
    """w_k = (1-alpha)^k, k = 0..L-1, computed by repeated
    multiplication (engine-replayable literals, no pow drift)."""
    w, out = 1.0, []
    for _ in range(lookback):
        out.append(w)
        w *= 1.0 - alpha
    return out


def ewma(
    df: DataFrame,
    value: str = "value",
    key: str = "record_id",
    order: str = "seq",
    alpha: float = 0.2,
    lookback: int = 32,
    out_col: str = "ewma",
    decimals: int | None = 6,
) -> DataFrame:
    """Adds ``out_col``: truncated-kernel EWMA of ``value`` within each
    ``key`` ordered by ``order``. One window partitioning — composes
    with the other signal ops without a second exchange."""
    w = Window.partitionBy(key).orderBy(order)
    weights = ewma_weights(alpha, lookback)
    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for k, wk in enumerate(weights):
        xk = F.col(value).cast("double") if k == 0 else F.lag(value, k).over(w).cast("double")
        num = num + F.when(xk.isNotNull(), xk * F.lit(wk)).otherwise(F.lit(0.0))
        den = den + F.when(xk.isNotNull(), F.lit(wk)).otherwise(F.lit(0.0))
    # all-null lookback (possible on gappy channels) → NULL, not a
    # divide-by-zero under ANSI mode; null samples carry no weight
    # (pandas ignore_na=True semantics)
    out = F.when(den > F.lit(0.0), num / den)
    if decimals is not None:
        out = F.round(out, decimals)
    return df.withColumn(out_col, out)
