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


def test_stream_rollup_hll_matches_batch(spark, sf_dir, tmp_path):
    """Streamed micro-batch rollup maintenance (foreachBatch ->
    upsert_rollup with HLL distinct state) converges to the one-shot
    batch rollup: algebraic state equal, sketch estimates equal."""
    from pyspark.sql import functions as F

    from tabata_spark.operators.rollup import read_rollup, rollup_events
    from tabata_spark.streaming.sinks import stream_rollup_maintain

    # split the events into 3 source files so maxFilesPerTrigger=1
    # produces three real micro-batches, each reopening merged buckets
    src_dir = str(tmp_path / "src")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as FF

    raw.repartition(3, FF.pmod("event_id", FF.lit(3))).write.parquet(src_dir)
    store = str(tmp_path / "roll")
    ck = str(tmp_path / "ck")
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    from tabata_spark.sources.relational import _normalize_ts as _nts

    q = stream_rollup_maintain(_nts(stream), store, ck, distinct_col="user_id")
    q.awaitTermination()

    got = {
        (str(r["win_start"]), r["event_type"]): (
            r["n"],
            round(r["sum_value"], 6),
            r["approx_user_id_distinct"],
        )
        for r in read_rollup(spark, store, distinct_col="user_id").collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    from tabata_spark.sources.relational import _normalize_ts

    batch = rollup_events(_normalize_ts(events), distinct_col="user_id")
    want = {
        (str(r["win_start"]), r["event_type"]): (
            r["n"],
            round(r["sum_value"], 6),
            r["est"],
        )
        for r in batch.select(
            "win_start", "event_type", "n", "sum_value",
            F.hll_sketch_estimate("user_id_hll").alias("est"),
        ).collect()
    }
    assert got == want and got


def test_stream_rollup_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running the stream from a FRESH checkpoint (so every batch
    replays) must not double the rollup: the batch ledger makes
    replayed batch ids no-ops."""
    from tabata_spark.operators.rollup import read_rollup
    from tabata_spark.sources.relational import _normalize_ts
    from tabata_spark.streaming.sinks import stream_rollup_maintain

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = str(tmp_path / "src")
    raw.coalesce(1).write.parquet(src_dir)
    store = str(tmp_path / "roll")

    def run(ck):
        stream = spark.readStream.schema(raw.schema).parquet(src_dir)
        q = stream_rollup_maintain(_normalize_ts(stream), store, ck)
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
    first = sorted(
        (str(r["win_start"]), r["event_type"], r["n"])
        for r in read_rollup(spark, store).collect()
    )
    run(str(tmp_path / "ck2"))  # fresh checkpoint -> batch 0 replays
    second = sorted(
        (str(r["win_start"]), r["event_type"], r["n"])
        for r in read_rollup(spark, store).collect()
    )
    assert second == first


def test_stream_rollup_txlog_matches_batch_and_replays_exactly_once(
    spark, sf_dir, tmp_path
):
    """The transactional rollup sink: converges to the one-shot batch
    rollup AND a full replay (fresh checkpoint, same store) is a no-op
    via txn tokens — no ledger files, no marker crash window."""
    from pyspark.sql import functions as F

    from tabata_spark.operators.rollup import rollup_events
    from tabata_spark.sources.relational import _normalize_ts
    from tabata_spark.sources.txlog import tx_read
    from tabata_spark.streaming.sinks import stream_rollup_txlog

    src_dir = str(tmp_path / "src")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw.repartition(3, F.pmod("event_id", F.lit(3))).write.parquet(src_dir)
    root = str(tmp_path / "roll")

    def run(ck_name):
        stream = (
            spark.readStream.schema(raw.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = stream_rollup_txlog(
            _normalize_ts(stream), root, str(tmp_path / ck_name),
            distinct_col="user_id",
        )
        q.awaitTermination()

    run("ck1")
    want = {
        (str(r["win_start"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in rollup_events(
            _normalize_ts(raw), distinct_col="user_id"
        ).collect()
    }
    got = {
        (str(r["win_start"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in tx_read(spark, root).collect()
    }
    assert got == want and got

    run("ck2")  # full replay with a fresh checkpoint: batch ids repeat
    again = {
        (str(r["win_start"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in tx_read(spark, root).collect()
    }
    assert again == want  # txn tokens swallowed every replayed batch


def test_stream_cms_txlog_matches_batch_and_replays_exactly_once(spark, tmp_path):
    from pyspark.sql import functions as F

    from tabata_spark.operators.sketch import cms_build
    from tabata_spark.sources.txlog import tx_read
    from tabata_spark.streaming.sinks import stream_cms_txlog

    rows = [(i, f"k{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k string")
    src = str(tmp_path / "src")
    df.repartition(3, F.pmod("id", F.lit(3))).write.parquet(src)
    root = str(tmp_path / "cms")

    def run(ck):
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_cms_txlog(stream, root, str(tmp_path / ck), "k", depth=3, width=16)
        q.awaitTermination()

    run("ck1")
    want = sorted(map(tuple, cms_build(df, "k", depth=3, width=16).collect()))
    assert sorted(map(tuple, tx_read(spark, root).collect())) == want
    run("ck2")  # replay with fresh checkpoint — txn tokens make it a no-op
    assert sorted(map(tuple, tx_read(spark, root).collect())) == want


def test_stream_dedup_ingest_near_dup_exactly_once(spark, tmp_path):
    """Streaming near-dup corpus building: micro-batches pass through
    the full LSH+verify ingest gate, survivors + signatures commit
    atomically with a batch txn token, and a restart from a FRESH
    checkpoint (full replay) changes nothing. Dedup state is the
    store itself — no side state beside the corpus table."""
    from tabata_spark.sources.txlog import tx_history, tx_read
    from tabata_spark.streaming.sinks import stream_dedup_ingest

    dup = "the quick brown fox jumps over the lazy dog again and again"
    uniq1 = "completely different text about spark dataframes and shuffles"
    uniq2 = "a brand new unique document mentioning catalyst and tungsten"

    src_dir = str(tmp_path / "src")
    root = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, dup), (2, dup), (3, uniq1), (4, uniq2)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = stream_dedup_ingest(stream, root, str(tmp_path / "ck"), app_id="ing")
    q.awaitTermination(120)
    # 2 near-dups 1 (batch-internal, min id survives)
    assert sorted(r["doc_id"] for r in tx_read(spark, root).collect()) == [1, 3, 4]
    assert tx_read(spark, root).columns == ["doc_id", "text", "sig"]

    # worst-case replay: a FRESH checkpoint over the UNCHANGED source
    # re-delivers every batch with the same ids/composition — the txn
    # tokens in the log must swallow all of it (exactly-once). (With a
    # fresh checkpoint AND a grown source, batches would re-compose
    # under already-committed ids and new data could be swallowed —
    # that is the documented contract: txn idempotence keys on
    # (app_id, batch_id), so restarts of a growing source must resume
    # from the SAME checkpoint, as below.)
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q2 = stream_dedup_ingest(stream2, root, str(tmp_path / "ck2"), app_id="ing")
    q2.awaitTermination(120)
    assert sorted(r["doc_id"] for r in tx_read(spark, root).collect()) == [1, 3, 4]

    # growth + restart from the SAME checkpoint: the new file becomes
    # a NEW batch id; docs near-dupping the STORED corpus are refused
    spark.createDataFrame(
        [(10, dup), (11, "entirely fresh content with tokens never seen before")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src_dir, mode="append")
    stream3 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q3 = stream_dedup_ingest(stream3, root, str(tmp_path / "ck"), app_id="ing")
    q3.awaitTermination(120)
    ids = sorted(r["doc_id"] for r in tx_read(spark, root).collect())
    assert 11 in ids           # the fresh doc landed
    assert 10 not in ids       # near-dup of stored doc 1: refused
    assert [i for i in ids if i <= 4] == [1, 3, 4]  # base corpus intact

    # every commit carries the app's txn token (atomic, exactly-once)
    assert all(c.get("txn", "").startswith("ing:") for c in tx_history(root))


def test_stream_dedup_ingest_indexed_parity(spark, tmp_path):
    """index_root routes the streaming ingest through the stored
    banded signature index: identical survivor set to the unindexed
    sink (same gate, different corpus read path), exactly-once under
    fresh-checkpoint replay, index current with the corpus at the
    end."""
    from tabata_spark.operators.sigidx import _indexed_through
    from tabata_spark.sources.txlog import tx_read, tx_version
    from tabata_spark.streaming.sinks import stream_dedup_ingest

    dup = "the quick brown fox jumps over the lazy dog again and again"
    uniq1 = "completely different text about spark dataframes and shuffles"
    uniq2 = "a brand new unique document mentioning catalyst and tungsten"

    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, dup), (2, dup), (3, uniq1), (4, uniq2)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def ingest(root, ck, index_root=None):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        stream_dedup_ingest(
            stream, root, str(tmp_path / ck), app_id="ing",
            index_root=index_root,
        ).awaitTermination(120)

    plain_root = str(tmp_path / "plain")
    idx_root = str(tmp_path / "indexed")
    sig_root = str(tmp_path / "sig")
    ingest(plain_root, "ckp")
    ingest(idx_root, "cki", index_root=sig_root)

    want = sorted(
        map(tuple, tx_read(spark, plain_root).select("doc_id", "text").collect())
    )
    got = sorted(
        map(tuple, tx_read(spark, idx_root).select("doc_id", "text").collect())
    )
    assert got == want  # byte-identical survivor set
    # the index absorbed the final corpus version (derived state current)
    assert _indexed_through(sig_root) == tx_version(idx_root)

    # fresh-checkpoint replay over the unchanged source: no-op
    ingest(idx_root, "cki2", index_root=sig_root)
    assert sorted(
        map(tuple, tx_read(spark, idx_root).select("doc_id", "text").collect())
    ) == want


def test_stream_txlog_append_exactly_once_over_object_store_log(
    spark, tmp_path
):
    """End-to-end integration of the two seams: a streaming txlog sink
    committing through an OBJECT-STORE log (tx_set_log_store) — no
    _txlog directory on any filesystem — still replays exactly-once
    via txn tokens. This is the 1000-executor deployment shape: S3
    conditional PUTs arbitrate micro-batch commits, Spark's own FS
    connectors carry the data files."""
    import os

    from pyspark.sql import functions as F

    from tabata_spark.sources.objectstore import (
        InMemoryObjectStore,
        ObjectStoreLogStore,
    )
    from tabata_spark.sources.txlog import tx_read, tx_set_log_store, tx_txns
    from tabata_spark.streaming.sinks import stream_txlog_append

    src_dir = str(tmp_path / "src")
    rows = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 13).alias("v")
    )
    rows.repartition(3, F.pmod("k", F.lit(3))).write.parquet(src_dir)
    root = str(tmp_path / "t")
    os.makedirs(root)
    store = InMemoryObjectStore()
    tx_set_log_store(root, ObjectStoreLogStore(store))
    try:

        def run(ck):
            stream = (
                spark.readStream.schema(rows.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
            )
            q = stream_txlog_append(
                stream, root, str(tmp_path / ck), app_id="app1"
            )
            q.awaitTermination()

        run("ck1")
        got = sorted((r["k"], r["v"]) for r in tx_read(spark, root).collect())
        want = sorted((r["k"], r["v"]) for r in rows.collect())
        assert got == want
        assert not os.path.exists(os.path.join(root, "_txlog"))
        assert any(k.endswith(".json") for k in store.list_prefix(""))
        n_versions = len(tx_txns(root))

        run("ck2")  # fresh checkpoint, same store: batch ids replay
        again = sorted((r["k"], r["v"]) for r in tx_read(spark, root).collect())
        assert again == want  # txn tokens swallowed every replayed batch
        assert len(tx_txns(root)) == n_versions
    finally:
        tx_set_log_store(root, None)
