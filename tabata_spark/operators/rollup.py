"""Hypertable-style continuous rollup — incremental maintenance of a
stored time-bucketed aggregate (the TimescaleDB "continuous
aggregate" shape the brief lists among custom operators Spark lacks).

The store holds MERGEABLE partial aggregates per (bucket, key):
count, sum, min, max — every one of which merges associatively, so a
new batch folds in by re-aggregating only the buckets it touches.
Distinct counts are NOT algebraic, so they ride as Datasketches HLL
sketches (``distinct_col``): sketch-of-union == union-of-sketches by
construction, which is exactly the property a mergeable store needs —
a 100 TB store keeps a few KB of sketch per (bucket, key) instead of
the distinct values themselves. Derived statistics (avg = sum/count,
estimate = hll_sketch_estimate) are computed at read time, never
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

#: algebraic partial-aggregate columns of the stored rollup
_STATE = ("n", "sum_value", "min_value", "max_value")


def _store_has_data(path: str) -> bool:
    """True iff the store directory holds at least one parquet file —
    a bare directory (crashed or empty-batch writer) must be treated
    as a fresh store, not read (schema inference would fail)."""
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def rollup_events(
    events: DataFrame,
    width: str = "1 hour",
    key: str = "event_type",
    distinct_col: str | None = None,
) -> DataFrame:
    """One-shot time-bucketed rollup in partial-aggregate form —
    also the ground truth an incrementally maintained store must
    equal. ``distinct_col`` adds a mergeable HLL sketch column
    ``{distinct_col}_hll``."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]
    state = list(_STATE)
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias(f"{distinct_col}_hll"))
        state.append(f"{distinct_col}_hll")
    return (
        events.groupBy(F.window("ts", width).alias("win"), key)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("win_start"),
            F.to_date(F.col("win.start")).alias("win_date"),
            key,
            *state,
        )
    )


def upsert_rollup(
    spark: SparkSession,
    store_path: str,
    batch: DataFrame,
    width: str = "1 hour",
    key: str = "event_type",
    distinct_col: str | None = None,
) -> None:
    """Fold a new batch of events into the stored rollup.

    1. Partially aggregate the batch (map-side combinable).
    2. Read ONLY the stored rows of touched buckets (win_date
       partition pruning via a broadcast semi-join on the batch's
       date set — a handful of literals for in-order arrival).
    3. Merge: union + re-aggregate with the mergeable state
       (counts/sums add, min/min, max/max, HLL sketches union).
    4. Dynamic-partition-overwrite the touched date partitions only.

    Replaying a batch is NOT idempotent (counts double) — pair with a
    checkpointed source or the dedup-append sink for exactly-once;
    the semantics here are the merge algebra, delivery is the
    caller's contract.
    """
    part = rollup_events(batch, width, key, distinct_col)
    if not part.head(1):
        # empty batch: nothing to merge — and do NOT touch the store
        # (an overwrite-write of an empty frame creates a schema-less
        # directory that breaks every later read)
        return
    if _store_has_data(store_path):
        dates = [r["win_date"] for r in part.select("win_date").distinct().collect()]
        stored = spark.read.parquet(store_path).filter(
            F.col("win_date").isin(dates)
        )
        merge_aggs = [
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        ]
        if distinct_col is not None:
            merge_aggs.append(
                F.hll_union_agg(f"{distinct_col}_hll").alias(f"{distinct_col}_hll")
            )
        merged = (
            part.unionByName(stored)
            .groupBy("win_start", "win_date", key)
            .agg(*merge_aggs)
        )
    else:
        merged = part
    (
        merged.write.mode("overwrite")
        .partitionBy("win_date")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store_path)
    )


def read_rollup(
    spark: SparkSession, store_path: str, distinct_col: str | None = None
) -> DataFrame:
    """The user-facing view: derived stats computed from the
    mergeable state at read time (avg; HLL cardinality estimate when
    the store carries a sketch column)."""
    df = spark.read.parquet(store_path)
    cols = [
        "win_start",
        "event_type",
        "n",
        "sum_value",
        "min_value",
        "max_value",
        (F.col("sum_value") / F.col("n")).alias("avg_value"),
    ]
    if distinct_col is not None:
        cols.append(
            F.hll_sketch_estimate(f"{distinct_col}_hll").alias(
                f"approx_{distinct_col}_distinct"
            )
        )
    return df.select(*cols)


def apply_delta(
    spark: SparkSession,
    store_path: str,
    base: DataFrame,
    changed_keys: DataFrame,
    width: str = "1 hour",
    key: str = "event_type",
    distinct_col: str | None = None,
    ts_col: str = "ts",
) -> None:
    """Fold a CDC delta (inserts AND deletes) into the stored rollup
    by PARTIAL RECOMPUTE: min/max and HLL sketches cannot retract, so
    instead of inventing retraction algebra the touched buckets are
    recomputed from the authoritative ``base`` table — reading ONLY
    the touched date partitions (broadcast semi-join pruning on the
    delta's date set) — and dynamic-partition-overwritten. Cost is
    O(touched partitions), never O(store) and never O(history);
    correctness is unconditional because every stat is rebuilt from
    source rows.

    ``changed_keys`` carries the affected rows' ``ts_col`` values
    (for deletes: the ts of the rows that were removed from base;
    for inserts: the new rows' ts) — only their dates matter."""
    dates = [
        r["d"]
        for r in changed_keys.select(
            F.to_date(ts_col).alias("d")
        ).distinct().collect()
    ]
    if not dates:
        return
    touched = base.filter(F.to_date(ts_col).isin(dates))
    part = rollup_events(touched, width, key, distinct_col).persist()
    try:
        # Dynamic partition overwrite only replaces partitions PRESENT
        # in the written data, so a touched date whose rows were ALL
        # deleted never appears in `part` and its stale partition would
        # survive the write. Diff the delta's date set against the
        # surviving dates and remove the emptied date directories — the
        # store is a plain filesystem layout (win_date=YYYY-MM-DD/); a
        # transactional table format would make this a DELETE.
        survived = {
            r["win_date"]
            for r in part.select("win_date").distinct().collect()
        }
        import shutil

        for d in dates:
            if d not in survived:
                shutil.rmtree(
                    os.path.join(store_path, f"win_date={d}"),
                    ignore_errors=True,
                )
        if survived:
            (
                part.write.mode("overwrite")
                .partitionBy("win_date")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(store_path)
            )
    finally:
        part.unpersist()
