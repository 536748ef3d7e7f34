"""Structured Streaming surface (north-star extension; the reference
is batch-only — SURVEY §2.10).

Event-time windowed aggregations with watermarks over the events
stream. Every aggregation here works identically on a batch frame and
a streaming frame (same ``F.window``/``session_window`` expressions),
which is how the tests validate them: run the streaming version with
``availableNow`` against the parquet events and compare to the batch
result.

``sessionize_batch`` additionally provides the *batch* gap-session
semantics as plain window functions (lag > gap ⇒ new session) — the
SQL-expressible twin used for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tabata_spark.operators.timeutil import epoch_diff_s

#: Hash-stable value aggregation: quantize the input double ONCE to
#: DECIMAL(18,6), then sum in exact decimal arithmetic. Decimal sums
#: are order-independent and bit-identical across engines (DuckDB sums
#: into a hugeint, Spark into a widened Decimal) — unlike IEEE-double
#: folds, whose result depends on partition order, or round(sum, k),
#: whose half-boundary behavior differs between engines by one ulp.
_VALUE_DEC = "decimal(18,6)"


def _dec_sum(col: str = "value"):
    return F.sum(F.col(col).cast(_VALUE_DEC)).cast(_VALUE_DEC)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """events table as a file stream (schema taken from the batch
    read; ts normalized identically — ``withWatermark`` hard-rejects
    TIMESTAMP_NTZ event time, so normalization is load-bearing here)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(
        spark.read.parquet(f"{sf_dir}/events.parquet").schema
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # file stream sources need a directory: stream the sf dir with a
    # glob picking out the events file
    raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    # same ts-shape normalization as the batch loader (ns-long legacy,
    # NTZ-us current)
    from tabata_spark.sources.relational import _normalize_ts

    return _normalize_ts(raw)


def tumbling_agg(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts per event_type."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum().alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows (overlapping)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            _dec_sum().alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
            "avg_value",
            "sum_value",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user via ``session_window`` (merges events
    closer than ``gap``)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), _dec_sum().alias("sum_value"))
        .select(
            "user_id",
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
            "sum_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Batch gap-sessionization with window functions only (the
    SQL-oracle twin of session semantics): a new session starts when
    the gap to the previous event exceeds ``gap_minutes``; session_id
    is the running count of starts. Returns per-session aggregates
    (user_id, session_id, n, t_start, t_end, sum_value).

    ``sum_value`` is an exact DECIMAL(18,6) sum (see ``_dec_sum``):
    decimal addition is associative, so the result is independent of
    partition order — hash-stable vs the DuckDB oracle by
    construction, with no need for the ordered collect_list fold this
    used before (round 4's only driver-red was the rounded-double
    variant of this very column)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60.0
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (epoch_diff_s(F.col("ts"), F.lag("ts").over(w)) > gap_s),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = events.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(run)
    )
    return (
        tagged.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
            _dec_sum().alias("sum_value"),
        )
    )


def run_stream_to_memory(
    sdf: DataFrame, name: str, spark: SparkSession, mode: str = "append"
) -> DataFrame:
    """Execute a streaming frame to completion with availableNow into
    an in-memory table; returns the batch result frame (test helper)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def session_sequence_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of
    :func:`tabata_spark.operators.sequences.session_sequences`:
    per-session ordered event-type sequences assembled INSIDE the
    streaming aggregation (sort_array over collected (ts, id, type)
    structs — the struct prefix makes the order total, so the emitted
    sequence is deterministic regardless of arrival order). State per
    open session is that session's events, expired by the watermark
    once the gap closes the session."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    ev = F.sort_array(
        F.collect_list(F.struct(F.col("ts").alias("t"), F.col("event_id").alias("i"),
                                F.col("event_type").alias("e")))
    )
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("t_start"),
            ev.alias("__ev"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("win_start"),
            "n_events",
            "t_start",
            F.array_join(F.transform("__ev", lambda s: s["e"]), " ").alias("seq"),
        )
    )
