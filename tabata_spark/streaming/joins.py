"""Stream-stream interval joins (north-star extension — SURVEY §2.10;
the reference is batch-only).

The canonical shape is attribution: every (click, purchase) pair for
the same user where the purchase lands within a horizon AFTER the
click. On streams, Spark requires BOTH sides watermarked and an
event-time range in the join condition — that range is what lets the
state store expire buffered rows (each side holds at most
horizon + watermark of history per key). Without the time bound a
stream-stream join's state grows forever; with it, state is
O(arrival rate × horizon), independent of stream length.

The SAME join expression works on batch frames (a plain range join),
which is how the battery oracle-checks it: ``attribution_pairs`` is
the batch twin, DuckDB runs the equivalent SQL, and the streaming
test asserts availableNow parity against the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabata_spark.operators.timeutil import epoch_diff_s, epoch_us


def _sides(
    events: DataFrame,
    left_type: str,
    right_type: str,
    user_col: str,
    ts_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    left = events.filter(F.col("event_type") == left_type).select(
        F.col(user_col).alias("l_user"),
        F.col(ts_col).alias("l_ts"),
        F.col(id_col).alias("l_id"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        F.col(user_col).alias("r_user"),
        F.col(ts_col).alias("r_ts"),
        F.col(id_col).alias("r_id"),
        F.col("value").alias("r_value"),
    )
    return left, right


def attribution_pairs(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon_s: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """(user, click, purchase, gap_s) pairs where the purchase falls in
    ``(click_ts, click_ts + horizon_s]`` — strict ">" on the left edge
    so an event never attributes to a simultaneous one.

    Batch: a user-equi join with a time-range residual — Catalyst
    plans the equi part (one shuffle on user) and evaluates the range
    as a post-join filter, so there is no quadratic range-join blowup
    beyond each user's in-horizon pairs. Streaming: identical
    expression with both sides watermarked; the range condition bounds
    the join state (Spark evicts buffered rows once the other side's
    watermark passes their horizon).
    """
    left, right = _sides(events, left_type, right_type, user_col, ts_col, id_col)
    if events.isStreaming:
        left = left.withWatermark("l_ts", watermark)
        right = right.withWatermark("r_ts", watermark)
    gap = epoch_diff_s("r_ts", "l_ts")
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (gap <= F.lit(float(horizon_s))),
        "inner",
    )
    return joined.select(
        F.col("l_user").alias("user_id"),
        F.col("l_id").alias("click_id"),
        F.col("r_id").alias("purchase_id"),
        gap.alias("gap_s"),
        # exact BIGINT gap — the hash-stable output encoding (gap_s
        # doubles are exact too at µs precision, but downstream
        # consumers that round them reopen the ulp boundary)
        (epoch_us("r_ts") - epoch_us("l_ts")).alias("gap_us"),
        F.col("r_value").alias("purchase_value"),
    )


def attribution_summary(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon_s: float = 1800.0,
    **kwargs,
) -> DataFrame:
    """Per-user attribution rollup over the pair stream: attributed
    purchase count (distinct purchases that had ≥1 preceding click in
    horizon) and their value sum. Works on batch; on streams, chain it
    after :func:`attribution_pairs` with an output-mode that fits the
    sink (the pair stream itself is append-safe)."""
    pairs = attribution_pairs(
        events, left_type, right_type, horizon_s, **kwargs
    )
    # distinct purchases first: a purchase with k preceding clicks
    # must count (and sum) once
    per_purchase = pairs.groupBy("user_id", "purchase_id").agg(
        F.first("purchase_value").alias("purchase_value")
    )
    # exact decimal sum — order-independent, hash-stable vs the oracle
    # (see streaming/windows._dec_sum rationale)
    return per_purchase.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.sum(F.col("purchase_value").cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("attributed_value"),
    )
