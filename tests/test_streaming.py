import pytest
from pyspark.sql import functions as F

from tabata_spark.sources.relational import load_table
from tabata_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    session_agg,
    sessionize_batch,
    sliding_agg,
    tumbling_agg,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _rows(df, keys):
    return sorted(tuple(r[k] for k in keys) for r in df.collect())


def test_streaming_tumbling_matches_batch(spark, sf_dir, events):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    # append mode holds back windows above the watermark on a finite
    # stream; complete mode emits the full state for batch comparison
    got = run_stream_to_memory(
        tumbling_agg(stream), "t_tumbling", spark, mode="complete"
    )
    want = tumbling_agg(events)
    keys = ["win_start", "win_end", "event_type", "n", "sum_value"]
    assert _rows(got, keys) == _rows(want, keys)


def test_streaming_sliding_matches_batch(spark, sf_dir, events):
    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_memory(sliding_agg(stream), "t_sliding", spark, mode="complete")
    want = sliding_agg(events)
    keys = ["win_start", "win_end", "n", "avg_value"]
    assert _rows(got, keys) == _rows(want, keys)
    # sliding windows overlap: strictly more windows than tumbling
    assert got.count() > tumbling_agg(events).count() / 2


def test_streaming_session_matches_batch(spark, sf_dir, events):
    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_memory(session_agg(stream), "t_session", spark, mode="complete")
    want = session_agg(events)
    keys = ["user_id", "win_start", "win_end", "n", "sum_value"]
    assert _rows(got, keys) == _rows(want, keys)


def test_sessionize_batch_equals_session_window(events):
    """The window-function sessionization must produce the same
    session partitioning as session_window (same gap)."""
    a = sessionize_batch(events, gap_minutes=30)
    b = session_agg(events, gap="30 minutes")
    # compare per-session (user, start, n, sum) — end differs by the
    # gap padding session_window adds to its window.end
    ka = sorted(
        (r["user_id"], r["t_start"], r["n"], r["sum_value"]) for r in a.collect()
    )
    kb = sorted(
        (r["user_id"], r["win_start"], r["n"], r["sum_value"]) for r in b.collect()
    )
    assert ka == kb


def test_watermark_present_in_plan(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    agg = tumbling_agg(stream, watermark="1 hour")
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


def test_stateful_out_of_tube_matches_batch(spark, sf_dir, events):
    """applyInPandasWithState running counter == batch aggregation."""
    from tabata_spark.streaming.stateful import streaming_out_of_tube

    stream = read_events_stream(spark, sf_dir)
    out = streaming_out_of_tube(stream, lo=5.0, hi=250.0)
    assert out.isStreaming
    got = run_stream_to_memory(out, "t_stateful", spark, mode="update")
    # update mode re-emits per batch; keep the final (max n) row per user
    final = {
        r["user_id"]: (r["n"], r["n_out"])
        for r in got.orderBy("user_id", "n").collect()
    }
    want = {
        r["user_id"]: (r["n"], r["n_out"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when((F.col("value") > 250.0) | (F.col("value") < 5.0), 1)).alias(
                "n_out"
            ),
        )
        .collect()
    }
    assert final == want


# -------------------------------------------------------- stream dedup


@pytest.fixture(scope="module")
def doc_stream_dir(spark, tmp_path_factory):
    """A small doc corpus with every text duplicated twice at
    different event times, written as parquet for file-streaming."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(10):
        for copy in range(2):
            rows.append(
                (
                    i * 2 + copy,
                    f"document body number {i}",
                    base + dt.timedelta(minutes=5 * i + copy),
                )
            )
    path = str(tmp_path_factory.mktemp("docstream"))
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _read_doc_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_stream_exact_dedup_matches_batch(spark, doc_stream_dir):
    from tabata_spark.operators.dedup import exact_dedup
    from tabata_spark.streaming.dedup import stream_exact_dedup

    stream = _read_doc_stream(spark, doc_stream_dir)
    out = stream_exact_dedup(stream, watermark="1 hour")
    assert out.isStreaming
    got = run_stream_to_memory(out, "t_dedup", spark, mode="append")
    assert got.count() == 10  # one survivor per distinct text
    assert got.select("content_hash").distinct().count() == 10
    batch = spark.read.parquet(doc_stream_dir)
    want = {r["text_hash"] for r in exact_dedup(batch).collect()}
    assert {r["content_hash"] for r in got.collect()} == want


def test_stream_seen_filter(spark, doc_stream_dir):
    from pyspark.sql import functions as F

    from tabata_spark.streaming.dedup import stream_seen_filter

    batch = spark.read.parquet(doc_stream_dir)
    seen = batch.filter(F.col("doc_id") < 10)  # first 5 texts known
    stream = _read_doc_stream(spark, doc_stream_dir)
    got = run_stream_to_memory(
        stream_seen_filter(stream, seen), "t_seen", spark, mode="append"
    )
    assert got.count() == 10  # 2 copies x 5 unseen texts
    assert got.filter(F.col("doc_id") < 10).count() == 0


def test_stream_dedup_by_key(spark, doc_stream_dir):
    from tabata_spark.streaming.dedup import stream_dedup_by_key

    stream = _read_doc_stream(spark, doc_stream_dir)
    got = run_stream_to_memory(
        stream_dedup_by_key(stream, ["text"], watermark="1 hour"),
        "t_bykey",
        spark,
        mode="append",
    )
    # (text, ts) pairs are all distinct -> nothing dropped
    assert got.count() == 20


def test_streaming_session_sequences_match_batch(spark, sf_dir):
    """availableNow streaming run of the sequence assembly equals both
    the same expression on the batch frame AND the window-function
    sessionizer's sequences (operators.sequences) — arrival order and
    micro-batching cannot change an emitted sequence."""
    from tabata_spark.operators.sequences import session_sequences
    from tabata_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        session_sequence_agg,
    )

    stream = session_sequence_agg(read_events_stream(spark, sf_dir))
    got = run_stream_to_memory(stream, "sess_seq", spark)
    rows_stream = {
        (r["user_id"], r["seq"]): r["n_events"] for r in got.collect()
    }
    batch_events = spark.read.parquet(f"{sf_dir}/events.parquet")
    from tabata_spark.sources.relational import _normalize_ts

    batch_events = _normalize_ts(batch_events)
    rows_batch = {
        (r["user_id"], r["seq"]): r["n_events"]
        for r in session_sequence_agg(batch_events).collect()
    }
    assert rows_stream == rows_batch and rows_stream
    rows_winfn = {
        (r["user_id"], r["seq"]): r["n_events"]
        for r in session_sequences(batch_events, gap_min=30.0).collect()
    }
    assert rows_stream == rows_winfn


def test_streaming_cusum_matches_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas CUSUM over an ordered availableNow
    replay equals the batch two-window closed form, row for row —
    O(1) state per key carrying (running_sum, running_min) across
    micro-batches."""
    from pyspark.sql import functions as F

    from tabata_spark.sources.relational import _normalize_ts
    from tabata_spark.streaming.stateful import batch_cusum, streaming_cusum

    events = _normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    # ordered single-file source -> deterministic replay; 3 users keep
    # the handler's per-key path multi-row
    src_dir = str(tmp_path / "src")
    sub = events.filter(F.col("user_id") < 3).orderBy("ts", "event_id")
    sub.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(sub.schema).parquet(src_dir)
    got = (
        streaming_cusum(stream, k=50.0, h=100.0)
        .writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    got.awaitTermination()
    stream_rows = {
        (r["user_id"], str(r["ts"])): (round(r["s"], 6), r["alarm"])
        for r in spark.sql("SELECT * FROM cusum_stream").collect()
    }
    batch_rows = {
        (r["user_id"], str(r["ts"])): (round(float(r["s"]), 6), r["alarm"])
        for r in batch_cusum(sub, k=50.0, h=100.0).collect()
    }
    assert stream_rows == batch_rows and stream_rows


def test_streaming_ewma_matches_batch_kernel(spark, sf_dir, tmp_path):
    """Streaming exact-recursive EWMA over an ordered availableNow
    replay equals the batch truncated kernel row-for-row on series
    shorter than the lookback (where truncation is a no-op), and both
    equal pandas ewm(adjust=True)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tabata_spark.operators.ewma import ewma
    from tabata_spark.sources.relational import _normalize_ts
    from tabata_spark.streaming.stateful import streaming_ewma

    events = _normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    # <= 30 rows per user (< lookback 32): truncated == exact recursion
    w = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    sub = (
        events.filter(F.col("user_id") < 3)
        .withColumn("__rn", w)
        .filter(F.col("__rn") <= 30)
        .drop("__rn")
        .orderBy("ts", "event_id")
    )
    src_dir = str(tmp_path / "src")
    sub.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(sub.schema).parquet(src_dir)
    got = (
        streaming_ewma(stream, alpha=0.2)
        .writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    got.awaitTermination()
    stream_rows = {
        (r["user_id"], str(r["ts"])): round(r["ewma"], 9)
        for r in spark.sql("SELECT * FROM ewma_stream").collect()
    }
    batch = ewma(
        sub.withColumn("seq", F.monotonically_increasing_id()),
        value="value",
        key="user_id",
        order="ts",
        alpha=0.2,
        lookback=32,
        decimals=None,
    )
    batch_rows = {
        (r["user_id"], str(r["ts"])): round(r["ewma"], 9)
        for r in batch.collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) == sub.count()
