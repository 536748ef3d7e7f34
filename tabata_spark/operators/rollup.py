"""Hypertable-style continuous rollup — incremental maintenance of a
stored time-bucketed aggregate (the TimescaleDB "continuous
aggregate" shape the brief lists among custom operators Spark lacks).

The store holds MERGEABLE partial aggregates per (bucket, key):
count, sum, min, max — every one of which merges associatively, so a
new batch folds in by re-aggregating only the buckets it touches.
Derived statistics (avg = sum/count) are computed at read time, never
stored — storing them would make the state non-mergeable.

Incremental cost model: a batch touches the buckets its event times
fall into (for in-order arrival, the recent ones; late data reopens
exactly its own bucket). The store is partitioned by bucket date, the
touched-partition set is pruned by dynamic partition overwrite, and
the merge re-aggregates stored rows of touched buckets only — work is
O(batch + touched buckets), independent of store size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: mergeable partial-aggregate columns of the stored rollup
_STATE = ("n", "sum_value", "min_value", "max_value")


def rollup_events(
    events: DataFrame, width: str = "1 hour", key: str = "event_type"
) -> DataFrame:
    """One-shot time-bucketed rollup in partial-aggregate form —
    also the ground truth an incrementally maintained store must
    equal."""
    return (
        events.groupBy(F.window("ts", width).alias("win"), key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.to_date(F.col("win.start")).alias("win_date"),
            key,
            *_STATE,
        )
    )


def upsert_rollup(
    spark: SparkSession,
    store_path: str,
    batch: DataFrame,
    width: str = "1 hour",
    key: str = "event_type",
) -> None:
    """Fold a new batch of events into the stored rollup.

    1. Partially aggregate the batch (map-side combinable).
    2. Read ONLY the stored rows of touched buckets (win_date
       partition pruning via a broadcast semi-join on the batch's
       date set — a handful of literals for in-order arrival).
    3. Merge: union + re-aggregate with the mergeable state
       (counts/sums add, min/min, max/max).
    4. Dynamic-partition-overwrite the touched date partitions only.

    Replaying a batch is NOT idempotent (counts double) — pair with a
    checkpointed source or the dedup-append sink for exactly-once;
    the semantics here are the merge algebra, delivery is the
    caller's contract.
    """
    part = rollup_events(batch, width, key)
    if os.path.isdir(store_path):
        dates = [r["win_date"] for r in part.select("win_date").distinct().collect()]
        stored = spark.read.parquet(store_path).filter(
            F.col("win_date").isin(dates)
        )
        merged = (
            part.unionByName(stored)
            .groupBy("win_start", "win_date", key)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
    else:
        merged = part
    (
        merged.write.mode("overwrite")
        .partitionBy("win_date")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store_path)
    )


def read_rollup(spark: SparkSession, store_path: str) -> DataFrame:
    """The user-facing view: derived stats computed from the
    mergeable state at read time."""
    df = spark.read.parquet(store_path)
    return df.select(
        "win_start",
        "event_type",
        "n",
        "sum_value",
        "min_value",
        "max_value",
        (F.col("sum_value") / F.col("n")).alias("avg_value"),
    )
