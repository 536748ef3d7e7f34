"""Streaming sinks via ``foreachBatch`` — the write half of the
streaming surface (SURVEY §2.10; the reference's ``put``/derived-file
sinks are batch-only).

``foreachBatch`` hands each micro-batch to ordinary batch writers, so
the engine's existing storage semantics (dynamic-partition-overwrite
upsert, bucketed tables) apply unchanged to streams. Checkpointing
gives at-least-once delivery per batch; the sinks here are designed
so replays are harmless:

- ``stream_upsert_parquet``: per-batch dynamic partition overwrite —
  replaying a batch rewrites the same partitions with the same rows
  (idempotent by construction);
- ``stream_dedup_append``: append only rows whose content hash is not
  already in the target — replay-safe because the second delivery
  finds its hashes present and appends nothing.

At scale the same shapes hold: overwrite touches only the partitions
present in the batch, and the dedup-append's anti-join reads only the
target's hash column (column-pruned scan), both independent of total
store size growth per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_upsert_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str = "record_id",
):
    """Micro-batch upsert into a partitioned parquet store — the
    streaming twin of ``SignalSet.put`` (dynamic partition overwrite:
    only partitions present in the batch are replaced). Returns the
    started query; callers drive it (``availableNow`` in tests)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .partitionBy(partition_col)
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_append(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    text_col: str = "text",
    hash_col: str = "content_hash",
):
    """Append-only ingest that drops rows whose content hash already
    exists in the target — exact dedup across ALL history (the
    watermark-free complement of streaming.dedup, which bounds state
    by a horizon; here the store itself is the state). The anti-join
    reads only the target's hash column. Replay-safe: re-delivered
    rows find their hashes present and append nothing."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hashed = batch_df.withColumn(
            hash_col, F.md5(F.col(text_col))
        ).dropDuplicates([hash_col])
        # explicit existence check (scheme-aware via Hadoop FS), NOT a
        # broad except: a transient read error (corrupt footer, FS
        # hiccup) must propagate and fail the batch — swallowing it as
        # "first batch" would skip the anti-join and append duplicates
        # exactly when the store is unhealthy, breaking the
        # replay-safety invariant
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        # a data file must exist, not just the directory: an empty
        # first batch leaves <path>/_SUCCESS with zero part files, and
        # spark.read.parquet on that throws schema-inference errors on
        # EVERY later batch — the stream would be wedged for good
        has_data = fs.exists(jpath) and any(
            not st.getPath().getName().startswith(("_", "."))
            for st in fs.listStatus(jpath)
        )
        if has_data:
            seen = spark.read.parquet(path).select(hash_col)
            hashed = hashed.join(seen, hash_col, "left_anti")
        hashed.write.mode("append").parquet(path)

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_rollup_maintain(
    sdf: DataFrame,
    store_path: str,
    checkpoint: str,
    width: str = "1 hour",
    key: str = "event_type",
    distinct_col: str | None = None,
):
    """Continuous-rollup maintenance as a stream sink: every
    micro-batch folds into the stored mergeable aggregate via
    ``upsert_rollup`` (counts/sums add, min/max fold, HLL sketches
    union — work per trigger is O(batch + touched buckets), never
    O(store)). The checkpointed source gives each batch exactly-once
    delivery into the merge, which is what makes the non-idempotent
    count/sum algebra safe here.

    Known double-count window: the per-batch idempotence marker is
    written AFTER the upsert commits, so a crash between the upsert and
    the marker write replays that one batch into the store on restart.
    This is the honest limit of a filesystem store — closing it needs a
    transactional table format (Delta/Iceberg) where the merge and the
    batch-id record commit atomically. The marker itself is written
    atomically (temp file + os.replace), so a torn write never counts
    as committed."""
    from tabata_spark.operators.rollup import upsert_rollup

    ledger = os.path.join(store_path + ".__batches__")

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        # idempotence ledger: foreachBatch is at-least-once (a batch
        # can re-run after a failure) and the count/sum merge algebra
        # is not idempotent — a committed marker per batch id makes
        # replays no-ops. The marker is written AFTER the upsert, so a
        # crash inside the gap still double-counts that one batch (the
        # honest limit of filesystem stores; a transactional table
        # format closes it).
        os.makedirs(ledger, exist_ok=True)
        marker = os.path.join(ledger, f"{batch_id}.done")
        if os.path.exists(marker):
            return
        upsert_rollup(
            batch_df.sparkSession, store_path, batch_df, width, key, distinct_col
        )
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("committed")
        os.replace(tmp, marker)

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_cms_maintain(
    sdf: DataFrame,
    store_path: str,
    checkpoint: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    hasher: str = "md5",
):
    """Continuous count-min-sketch maintenance as a stream sink: each
    micro-batch folds into the stored sketch via
    ``operators.sketch.cms_upsert`` (union + exact counter sums —
    work per trigger is O(batch) + O(depth*width), never O(history)).
    Counter addition is not idempotent, so the same atomic per-batch
    ledger as ``stream_rollup_maintain`` makes replays no-ops (same
    documented crash-window caveat)."""
    from tabata_spark.operators.sketch import cms_upsert

    ledger = os.path.join(store_path + ".__batches__")

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(ledger, exist_ok=True)
        marker = os.path.join(ledger, f"{batch_id}.done")
        if os.path.exists(marker):
            return
        cms_upsert(
            batch_df.sparkSession,
            store_path,
            batch_df,
            key_col,
            depth,
            width,
            salt,
            hasher,
        )
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("committed")
        os.replace(tmp, marker)

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_scd2_maintain(
    sdf: DataFrame,
    store_path: str,
    checkpoint: str,
    key: str = "key",
    ts: str = "ts",
    tracked: list[str] | None = None,
):
    """Continuous SCD2 dimension maintenance: each micro-batch of
    change events folds into the stored type-2 dimension via
    ``operators.scd.scd2_apply`` — only the batch's keys are rebuilt
    (their history + the batch re-run through the one-window history
    builder), everything else is rewritten untouched. Work per
    trigger is O(batch keys' history); the same atomic per-batch
    ledger as the other merge sinks makes replays no-ops.

    Store rewrite note: the apply result is eagerly materialized
    (localCheckpoint) before the overwrite so the write never races
    its own input scan — at warehouse scale the store would be a
    transactional table (Delta/Iceberg MERGE) and only touched
    partitions would rewrite.

    Ordering caveat: the fold is order-independent for CHANGE states
    (each carries its own ts and key histories are re-sorted), with
    one exception — a state collapsed as a no-op against its
    then-predecessor is gone, so if an EARLIER change later arrives
    between the two, the dropped state cannot re-split. Feed change
    logs per-key in order (the normal CDC contract) to avoid it."""
    from tabata_spark.operators.scd import scd2_apply, scd2_history

    ledger = os.path.join(store_path + ".__batches__")

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(ledger, exist_ok=True)
        marker = os.path.join(ledger, f"{batch_id}.done")
        if os.path.exists(marker):
            return
        spark = batch_df.sparkSession
        if os.path.isdir(store_path) and any(
            f.endswith(".parquet") for f in os.listdir(store_path)
        ):
            dim = spark.read.parquet(store_path)
            merged = scd2_apply(dim, batch_df, key=key, ts=ts, tracked=tracked)
        else:
            merged = scd2_history(batch_df, key=key, ts=ts, tracked=tracked)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            store_path
        )
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("committed")
        os.replace(tmp, marker)

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_txlog_append(
    sdf: DataFrame,
    root: str,
    checkpoint: str,
    app_id: str = "stream",
):
    """Exactly-once streaming append into a transactional table
    (sources/txlog.py): each micro-batch commits through
    ``tx_write(txn=f"{app_id}:{batch_id}")`` — the Delta
    transaction-identifier pattern. Unlike the ledger-file sinks
    above, idempotence lives IN the commit log itself: a replayed
    batch finds its txn token in a committed entry and writes nothing,
    with no crash window between data write and marker write (the
    O_EXCL log claim is the single atomic point). Readers get snapshot
    isolation for free."""
    from tabata_spark.sources.txlog import tx_write

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        tx_write(batch_df, root, txn=f"{app_id}:{batch_id}")

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_rollup_txlog(
    sdf: DataFrame,
    root: str,
    checkpoint: str,
    width: str = "1 hour",
    key: str = "event_type",
    distinct_col: str | None = None,
    app_id: str = "rollup",
):
    """Continuous rollup maintenance with NO double-count window: the
    store is a transactional table (sources/txlog.py) and each
    micro-batch commits the merged state as one atomic overwrite with
    ``txn=f"{app_id}:{batch_id}"``. A crash anywhere before the log
    claim leaves the store at the previous version and the replayed
    batch merges against exactly that state; a replay after the claim
    finds its txn token and is a no-op. This is the closure of the
    documented ledger-sink caveat (``stream_rollup_maintain``): there,
    the idempotence marker lands AFTER the upsert, so a crash in the
    gap double-counts one batch — here the commit IS the marker.

    The store holds the mergeable rollup state (O(buckets x keys)
    partial aggregates, small by construction — that is the point of
    a rollup), so the per-batch overwrite rewrites state, not
    history; readers get snapshot isolation and time travel over the
    rollup's own evolution for free."""
    from tabata_spark.operators.rollup import rollup_events
    from tabata_spark.sources.txlog import tx_read, tx_write

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = rollup_events(batch_df, width, key, distinct_col)
        if not part.head(1):
            return
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
        try:
            stored = tx_read(spark, root)
            merged = (
                part.unionByName(stored)
                .groupBy("win_start", "win_date", key)
                .agg(*merge_aggs)
            )
        except ValueError:  # fresh store
            merged = part
        # materialize BEFORE the overwrite commit: the merged plan
        # reads the store's current files, which the new version
        # replaces — same discipline as cms_upsert's localCheckpoint
        tx_write(
            merged.localCheckpoint(eager=True),
            root,
            mode="overwrite",
            txn=f"{app_id}:{batch_id}",
        )

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_cms_txlog(
    sdf: DataFrame,
    root: str,
    checkpoint: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    hasher: str = "md5",
    app_id: str = "cms",
):
    """Count-min-sketch maintenance with NO double-count window — the
    txlog twin of ``stream_cms_maintain``, same closure as
    ``stream_rollup_txlog``: each micro-batch commits the merged
    sketch as one atomic overwrite with ``txn=f"{app_id}:{batch_id}"``
    (the commit IS the idempotence marker). The sketch GEOMETRY
    (depth/width/salt/hasher) is validated against the same sidecar
    ``cms_upsert`` keeps — the txlog's schema enforcement cannot see
    it (every geometry shares the (row, bucket, c) schema), and
    merging buckets hashed under different geometry silently corrupts
    every later estimate. State is bounded by depth*width rows
    regardless of stream length."""
    from tabata_spark.operators.sketch import (
        _cms_check_meta,
        _cms_meta_path,
        cms_build,
        cms_merge,
    )
    from tabata_spark.sources.txlog import tx_read, tx_write

    geometry = {"depth": depth, "width": width, "salt": salt, "hasher": hasher}

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        import json

        spark = batch_df.sparkSession
        _cms_check_meta(root, geometry)
        meta = _cms_meta_path(root)
        if not os.path.exists(meta):
            tmp = meta + ".tmp"
            with open(tmp, "w") as f:
                json.dump(geometry, f)
            os.replace(tmp, meta)
        part = cms_build(batch_df, key_col, depth, width, salt, hasher)
        if not part.head(1):
            return
        try:
            part = cms_merge(part, tx_read(spark, root))
        except ValueError:  # fresh store
            pass
        tx_write(
            part.localCheckpoint(eager=True),
            root,
            mode="overwrite",
            txn=f"{app_id}:{batch_id}",
        )

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_ingest(
    sdf: DataFrame,
    root: str,
    checkpoint: str,
    app_id: str = "ingest",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    index_root: str | None = None,
    prune_key_limit: int = 0,
):
    """Exactly-once streaming NEAR-dup corpus building: each
    micro-batch runs the full continuous-ingestion gate
    (operators/dedup.dedup_ingest_batch — LSH candidates against the
    stored corpus signatures, exact-Jaccard verify, deterministic
    min-id survivor rule) and commits survivors + their minhash
    signatures in ONE atomic txlog commit carrying
    ``txn=f"{app_id}:{batch_id}"``. The composition inherits both
    guarantees wholesale: a replayed batch finds its txn token and
    writes nothing (exactly-once, no crash window — the log claim is
    the single atomic point), and dedup state IS the store's sig
    column (no side state to checkpoint, restore, or drift: restart
    from a fresh streaming checkpoint and the corpus still refuses
    everything it already holds, exact or near). This is
    stream_dedup_append's near-dup generalization — that sink's
    anti-join on exact content hashes becomes the banded-LSH +
    verify pipeline, with the same column-pruned corpus-side scan
    shape (ids + signatures only, never stored text bytes).

    Contract (all txn-token sinks): idempotence keys on
    ``(app_id, batch_id)``, which presumes a batch id re-delivers the
    SAME rows. Restarts of a growing source must resume from the same
    streaming checkpoint (new files become new batch ids); starting a
    fresh checkpoint is only exactly-once over an unchanged source —
    over a grown one it would re-compose batches under
    already-committed ids and silently swallow the new rows
    (test-pinned in test_stream_sinks.py).

    ``index_root`` switches the corpus side to the stored banded
    signature index (operators/sigidx.py,
    dedup_ingest_batch_indexed): the per-batch candidate generation
    reads the narrow (band, bh, doc_id) index instead of re-banding
    stored signatures, and small micro-batches additionally
    file-prune the index via ``prune_key_limit`` — the serving shape
    for high-frequency micro-batches against a large corpus. Index
    lag from any crash is repaired by the ingest's own catch-up, so
    the exactly-once story is unchanged (tokens live on the CORPUS
    commit; the index is derived state)."""
    from tabata_spark.operators.dedup import dedup_ingest_batch
    from tabata_spark.operators.sigidx import dedup_ingest_batch_indexed

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if index_root is not None:
            dedup_ingest_batch_indexed(
                batch_df.sparkSession,
                root,
                index_root,
                batch_df,
                text=text_col,
                id_col=id_col,
                txn=f"{app_id}:{batch_id}",
                threshold=threshold,
                prune_key_limit=prune_key_limit,
            )
        else:
            dedup_ingest_batch(
                batch_df.sparkSession,
                root,
                batch_df,
                text=text_col,
                id_col=id_col,
                txn=f"{app_id}:{batch_id}",
                threshold=threshold,
            )

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
