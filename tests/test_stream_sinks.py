"""foreachBatch sinks: upsert parity with the batch store; dedup-append
idempotence (streaming/sinks.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabata_spark.sources.relational import load_table
from tabata_spark.streaming.sinks import stream_dedup_append, stream_upsert_parquet
from tabata_spark.streaming.windows import read_events_stream


def test_stream_upsert_matches_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    stream = read_events_stream(spark, sf_dir).withColumn(
        "record_id", F.col("user_id").cast("string")
    )
    q = stream_upsert_parquet(stream, out, ck)
    q.awaitTermination()
    got = spark.read.parquet(out)
    want = load_table(spark, sf_dir, "events")
    assert got.count() == want.count()
    # per-partition row counts survive the partitioned layout
    # partition-column type inference reads the dir names as ints
    g = {str(r["record_id"]): r["n"] for r in got.groupBy("record_id").count().withColumnRenamed("count", "n").collect()}
    w = {str(r["user_id"]): r["n"] for r in want.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    assert g == w


def _doc_stream(spark, tmp_path, texts, name):
    src = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(df.schema).parquet(src)


def test_dedup_append_is_replay_safe(spark, tmp_path):
    texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon"]
    out = str(tmp_path / "corpus")

    s1 = _doc_stream(spark, tmp_path, texts, "src1")
    q = stream_dedup_append(s1, out, str(tmp_path / "ck1"))
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 3  # in-batch dup dropped

    # second delivery of the SAME texts (fresh source+checkpoint =
    # a replay): nothing new appends
    s2 = _doc_stream(spark, tmp_path, texts, "src2")
    q = stream_dedup_append(s2, out, str(tmp_path / "ck2"))
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 3

    # genuinely new text still lands
    s3 = _doc_stream(spark, tmp_path, ["zeta eta"], "src3")
    q = stream_dedup_append(s3, out, str(tmp_path / "ck3"))
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert got.select("content_hash").distinct().count() == 4


def test_dedup_append_survives_pre_existing_empty_store(spark, tmp_path):
    """A store directory holding only _SUCCESS (the residue of an
    empty first batch) must read as 'no history yet', not wedge every
    later batch with a schema-inference error."""
    import os

    from tabata_spark.streaming.sinks import stream_dedup_append

    out = str(tmp_path / "corpus2")
    os.makedirs(out)
    open(os.path.join(out, "_SUCCESS"), "w").close()

    texts = ["alpha beta", "gamma delta", "alpha beta"]
    stream = _doc_stream(spark, tmp_path, texts, "src_empty")
    q = stream_dedup_append(stream, out, str(tmp_path / "ck_empty"))
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 2  # dedup within the batch still applies
