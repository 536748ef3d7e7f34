"""Stored banded signature index (operators/sigidx.py): value-set
file pruning, indexed-vs-plain ingest equality, point near-dup
probes, and the self-healing derived-state (crash catch-up)
contract."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from tabata_spark.operators.dedup import dedup_ingest_batch
from tabata_spark.operators.sigidx import (
    _indexed_through,
    dedup_ingest_batch_indexed,
    neardup_probe,
    sigidx_build,
    sigidx_catchup,
    sigidx_compact,
)
from tabata_spark.sources.txlog import (
    tx_files_for_values,
    tx_read,
    tx_read_values,
    tx_version,
    tx_write,
)


# -- deterministic corpus: random 40-token docs from a 5000-word
#    vocabulary (distinct docs land far below any Jaccard threshold)


def _doc(rng: random.Random) -> str:
    return " ".join(f"w{rng.randrange(5000)}" for _ in range(40))


def _mutate(text: str, k: int, rng: random.Random) -> str:
    toks = text.split(" ")
    for _ in range(k):
        toks[rng.randrange(len(toks))] = f"m{rng.randrange(1000)}"
    return " ".join(toks)


@pytest.fixture(scope="module")
def batches():
    rng = random.Random(20260815)
    b1 = [(f"a{i:04d}", _doc(rng)) for i in range(120)]
    # b2: 60 novel + 15 near-dups of b1 docs + 5 internal dup pairs
    b2 = [(f"b{i:04d}", _doc(rng)) for i in range(60)]
    b2 += [(f"c{i:04d}", _mutate(b1[i][1], 2, rng)) for i in range(15)]
    internal = [_doc(rng) for _ in range(5)]
    b2 += [(f"d{i:04d}", t) for i, t in enumerate(internal)]
    b2 += [(f"e{i:04d}", _mutate(t, 1, rng)) for i, t in enumerate(internal)]
    # b3: 40 novel + 10 near-dups of b2 novels
    b3 = [(f"f{i:04d}", _doc(rng)) for i in range(40)]
    b3 += [(f"g{i:04d}", _mutate(b2[i][1], 2, rng)) for i in range(10)]
    return b1, b2, b3


def _ids(spark, root):
    return sorted(r[0] for r in tx_read(spark, root).select("doc_id").collect())


def test_files_for_values_prunes_after_cluster(spark, tmp_path):
    root = str(tmp_path / "t")
    tx_write(
        spark.range(0, 4000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ),
        root,
        stats_cols=["k"],
    )
    from tabata_spark.sources.txlog import tx_compact

    tx_compact(spark, root, n_files=16, cluster_by=["k"], stats_cols=["k"])
    # 3 point probes against 16 range-owning files: ≤3 kept
    kept, skipped = tx_files_for_values(root, "k", [5, 2000, 3999])
    assert len(kept) <= 3 and skipped >= 13
    got = sorted(
        r["k"] for r in tx_read_values(spark, root, "k", [5, 2000, 3999]).collect()
    )
    assert got == [5, 2000, 3999]
    # empty probe list: nothing kept
    kept, skipped = tx_files_for_values(root, "k", [])
    assert kept == [] and skipped == 16
    # probes outside the value space: everything skipped
    kept, skipped = tx_files_for_values(root, "k", [-5, 99999])
    assert kept == [] and skipped == 16


def test_files_for_values_conservative_without_stats(spark, tmp_path):
    root = str(tmp_path / "t")
    tx_write(spark.range(0, 100).select(F.col("id").alias("k")), root)  # no stats
    kept, skipped = tx_files_for_values(root, "k", [5])
    assert skipped == 0 and len(kept) >= 1  # kept conservatively


def test_indexed_ingest_equals_plain(spark, tmp_path, batches):
    b1, b2, b3 = batches
    plain_root = str(tmp_path / "plain")
    idx_root, idx = str(tmp_path / "idx"), str(tmp_path / "idx_sig")
    for i, b in enumerate((b1, b2, b3)):
        df = spark.createDataFrame(b, "doc_id string, text string")
        dedup_ingest_batch(spark, plain_root, df, txn=f"t{i}")
        dedup_ingest_batch_indexed(spark, idx_root, idx, df, txn=f"t{i}")
    assert _ids(spark, plain_root) == _ids(spark, idx_root)
    # the dedup actually dropped things (near-dups + internal dups)
    total = len(b1) + len(b2) + len(b3)
    assert len(_ids(spark, plain_root)) < total
    # index covers the corpus' current version
    assert _indexed_through(idx) == tx_version(idx_root)


def test_indexed_ingest_replay_is_noop(spark, tmp_path, batches):
    b1, _, _ = batches
    root, idx = str(tmp_path / "r"), str(tmp_path / "r_sig")
    df = spark.createDataFrame(b1, "doc_id string, text string")
    v1 = dedup_ingest_batch_indexed(spark, root, idx, df, txn="t0")
    v2 = dedup_ingest_batch_indexed(spark, root, idx, df, txn="t0")
    assert v1 == v2 == tx_version(root)
    assert len(_ids(spark, root)) == len(b1)


def test_crash_catchup_heals_index(spark, tmp_path, batches):
    """Simulate a crash between the corpus commit and the index
    commit: batch 2 lands via the UNINDEXED pipeline (corpus moves,
    index doesn't). The next indexed ingest must catch up FIRST —
    otherwise b2's survivors would be invisible to candidate
    generation and b3's near-dups of them would survive wrongly."""
    b1, b2, b3 = batches
    plain_root = str(tmp_path / "p")
    root, idx = str(tmp_path / "h"), str(tmp_path / "h_sig")
    for i, b in enumerate((b1, b2, b3)):
        dedup_ingest_batch(
            spark,
            plain_root,
            spark.createDataFrame(b, "doc_id string, text string"),
            txn=f"t{i}",
        )
    d1 = spark.createDataFrame(b1, "doc_id string, text string")
    d2 = spark.createDataFrame(b2, "doc_id string, text string")
    d3 = spark.createDataFrame(b3, "doc_id string, text string")
    dedup_ingest_batch_indexed(spark, root, idx, d1, txn="t0")
    dedup_ingest_batch(spark, root, d2, txn="t1")  # "crash": no index update
    assert _indexed_through(idx) < tx_version(root)  # index lags
    dedup_ingest_batch_indexed(spark, root, idx, d3, txn="t2")
    assert _ids(spark, root) == _ids(spark, plain_root)
    assert _indexed_through(idx) == tx_version(root)


def test_probe_finds_neardup_and_prunes_files(spark, tmp_path, batches):
    b1, _, _ = batches
    root, idx = str(tmp_path / "q"), str(tmp_path / "q_sig")
    df = spark.createDataFrame(b1, "doc_id string, text string")
    dedup_ingest_batch_indexed(spark, root, idx, df, txn="t0")
    # cluster into 64 bh-range files: a 16-key probe touches ≤16
    sigidx_compact(spark, idx, n_files=64)
    rng = random.Random(99)
    near = _mutate(b1[7][1], 1, rng)  # 1 token: jaccard ≥ ~0.85
    hits = neardup_probe(spark, root, idx, near).collect()
    assert [h["doc_id"] for h in hits] == ["a0007"]
    assert hits[0]["jaccard"] >= 0.8
    novel = neardup_probe(spark, root, idx, _doc(rng)).collect()
    assert novel == []
    # pruning pin: the probe's 16 bucket hashes keep ≤16 of 64 files
    from tabata_spark.operators.dedup import minhash_signatures
    from tabata_spark.operators.sigidx import banded_rows

    probe_df = spark.createDataFrame([("p", near)], "doc_id string, text string")
    keys = [
        r["bh"]
        for r in banded_rows(minhash_signatures(probe_df)).select("bh").collect()
    ]
    kept, skipped = tx_files_for_values(idx, "bh", keys)
    assert len(kept) <= 16 and len(kept) + skipped == 64


def test_small_batch_pruned_ingest_matches(spark, tmp_path, batches):
    """prune_key_limit path: a micro-batch reads only its buckets'
    files and still commits the same survivors."""
    b1, _, _ = batches
    rng = random.Random(5)
    micro = [("m0000", _mutate(b1[3][1], 1, rng)), ("m0001", _doc(rng))]
    roots = {}
    for tag, limit in (("full", 0), ("pruned", 4096)):
        root, idx = str(tmp_path / tag), str(tmp_path / f"{tag}_sig")
        d1 = spark.createDataFrame(b1, "doc_id string, text string")
        dm = spark.createDataFrame(micro, "doc_id string, text string")
        dedup_ingest_batch_indexed(spark, root, idx, d1, txn="t0")
        sigidx_compact(spark, idx, n_files=32)
        dedup_ingest_batch_indexed(
            spark, root, idx, dm, txn="t1", prune_key_limit=limit
        )
        roots[tag] = _ids(spark, root)
    assert roots["full"] == roots["pruned"]
    # the near-dup was dropped, the novel doc kept
    assert "m0001" in roots["full"] and "m0000" not in roots["full"]


def test_geometry_mismatch_raises(spark, tmp_path, batches):
    b1, _, _ = batches
    root, idx = str(tmp_path / "g"), str(tmp_path / "g_sig")
    df = spark.createDataFrame(b1[:20], "doc_id string, text string")
    dedup_ingest_batch_indexed(spark, root, idx, df, txn="t0")
    with pytest.raises(ValueError, match="geometry mismatch"):
        neardup_probe(spark, root, idx, "some text", bands=8, rows=4)


def test_build_then_catchup_noop(spark, tmp_path, batches):
    b1, _, _ = batches
    root, idx = str(tmp_path / "n"), str(tmp_path / "n_sig")
    dedup_ingest_batch(
        spark, root, spark.createDataFrame(b1, "doc_id string, text string"), txn="t0"
    )
    v = sigidx_build(spark, root, idx)
    assert v == tx_version(root)
    assert sigidx_catchup(spark, root, idx) == v  # already current: no-op
    n_rows = tx_read(spark, idx).count()
    assert n_rows == len(b1) * 16  # bands rows per doc


def test_vacuum_gates_on_staleness_then_shrinks(spark, tmp_path, batches):
    """VERDICT r8 item 7: the index tolerates stale entries but must
    be shrinkable under delete churn — gated so idle calls are one
    aggregation, and the rewrite keeps bh-clustered prunable files."""
    from tabata_spark.operators.sigidx import sigidx_vacuum
    from tabata_spark.sources.txlog import tx_delete_where

    b1, _, _ = batches
    root, idx = str(tmp_path / "v"), str(tmp_path / "v_sig")
    dedup_ingest_batch(
        spark, root, spark.createDataFrame(b1, "doc_id string, text string"), txn="t0"
    )
    v = sigidx_build(spark, root, idx)
    bands = 16

    # fresh index: zero staleness, gate keeps it untouched
    r = sigidx_vacuum(spark, root, idx)
    assert r == {
        "total_rows": len(b1) * bands,
        "stale_rows": 0,
        "stale_ratio": 0.0,
        "vacuumed": False,
        "version": tx_version(idx),
    }

    # delete 20/120 docs (~17% stale): below the 30% gate -> no rewrite
    tx_delete_where(spark, root, F.col("doc_id") < "a0020")
    idx_v_before = tx_version(idx)
    r = sigidx_vacuum(spark, root, idx)
    assert not r["vacuumed"]
    assert r["stale_rows"] == 20 * bands
    assert tx_version(idx) == idx_v_before  # no commit happened

    # delete 40 more (60/120 = 50% stale): gate trips, index shrinks
    tx_delete_where(spark, root, F.col("doc_id") < "a0060")
    r = sigidx_vacuum(spark, root, idx)
    assert r["vacuumed"]
    assert r["stale_rows"] == 60 * bands
    assert tx_read(spark, idx).count() == 60 * bands  # live rows only
    live_ids = {x[0] for x in tx_read(spark, idx).select("doc_id").distinct().collect()}
    assert live_ids == {f"a{i:04d}" for i in range(60, 120)}

    # the corpus-version high-water token survives the overwrite: the
    # only gap commits are pure deletes, so catch-up needs no rebuild
    # and the probe path still serves correctly from the vacuumed index
    hits = neardup_probe(spark, root, idx, dict(b1)["a0100"]).collect()
    assert [h["doc_id"] for h in hits] == ["a0100"]
    gone = neardup_probe(spark, root, idx, dict(b1)["a0005"]).collect()
    assert gone == []  # deleted doc no longer probe-visible


def test_vacuum_bounds_index_under_delete_heavy_churn(spark, tmp_path, batches):
    """Delete-heavy sequence: ingest/delete/vacuum loop keeps index
    size proportional to the LIVE corpus, never cumulative history."""
    from tabata_spark.operators.sigidx import sigidx_vacuum
    from tabata_spark.sources.txlog import tx_delete_where

    b1, b2, _ = batches
    root, idx = str(tmp_path / "w"), str(tmp_path / "w_sig")
    bands = 16
    df1 = spark.createDataFrame(b1, "doc_id string, text string")
    dedup_ingest_batch_indexed(spark, root, idx, df1, txn="t0")
    n_live = tx_read(spark, root).count()
    def _count(r):
        try:
            return tx_read(spark, r).count()
        except ValueError:  # empty snapshot
            return 0

    for i, cut in enumerate(("a0040", "a0080", "a0120")):
        tx_delete_where(spark, root, F.col("doc_id") < cut)
        n_live = _count(root)
        sigidx_vacuum(spark, root, idx, min_stale_ratio=0.25)
        assert _count(idx) <= max(n_live, 1) * bands
    # everything from b1 deleted; index must be near-empty, and a
    # fresh indexed ingest (which rebuilds over the delete gap) still
    # lands with exact parity
    assert n_live == 0
    df2 = spark.createDataFrame(b2[:30], "doc_id string, text string")
    dedup_ingest_batch_indexed(spark, root, idx, df2, txn="t1")
    assert _count(idx) == _count(root) * bands


def test_catchup_rebuilds_over_replace_gap(spark, tmp_path, batches):
    """A replace-mode commit in the catch-up gap (tx_merge upserting
    CHANGED text) rewrites rows the append-only change feed never
    surfaces; catch-up must detect it and fall back to a full rebuild
    so the index reflects the new content — probes on the NEW text
    must hit, probes on the OLD text must miss."""
    from tabata_spark.operators.dedup import minhash_signatures
    from tabata_spark.sources.txlog import tx_merge

    b1, _, _ = batches
    root, idx = str(tmp_path / "rg"), str(tmp_path / "rg_sig")
    dedup_ingest_batch(
        spark, root, spark.createDataFrame(b1, "doc_id string, text string"), txn="t0"
    )
    sigidx_build(spark, root, idx)
    vi = _indexed_through(idx)

    # gap: upsert doc a0007 with entirely new text via a replace commit
    new_text = " ".join(f"z{i}" for i in range(40))
    upd = spark.createDataFrame([("a0007", new_text)], "doc_id string, text string")
    upd = upd.join(
        minhash_signatures(upd, "text", "doc_id", 32, 3), "doc_id"
    ).select("doc_id", "text", "sig")
    tx_merge(spark, root, upd, ["doc_id"])
    assert tx_version(root) > vi

    v = sigidx_catchup(spark, root, idx)
    assert v == tx_version(root)
    # the rebuilt index serves the NEW content and no longer the old
    hits = neardup_probe(spark, root, idx, new_text).collect()
    assert [h["doc_id"] for h in hits] == ["a0007"]
    old_hits = neardup_probe(spark, root, idx, dict(b1)["a0007"]).collect()
    assert old_hits == []


def test_maintain_runs_catchup_vacuum_and_compact(spark, tmp_path, batches):
    """sigidx_maintain = catch-up + gated vacuum + fragmentation-gated
    recluster, each idempotent: after ingest lag, heavy deletes, and
    file fragmentation, one call restores a current, shrunk,
    probe-prunable index; a second call is a no-op."""
    from tabata_spark.operators.sigidx import sigidx_maintain
    from tabata_spark.sources.txlog import tx_delete_where, tx_version

    b1, b2, _ = batches
    root, idx = str(tmp_path / "m"), str(tmp_path / "m_sig")
    d1 = spark.createDataFrame(b1, "doc_id string, text string")
    d2 = spark.createDataFrame(b2[:60], "doc_id string, text string")
    dedup_ingest_batch_indexed(spark, root, idx, d1, txn="t0")
    # lag: second batch lands unindexed; then delete most of b1
    dedup_ingest_batch(spark, root, d2, txn="t1")
    tx_delete_where(spark, root, F.col("doc_id") < "a0100")

    r = sigidx_maintain(
        spark, root, idx, min_stale_ratio=0.2, max_files=1, n_files=2
    )
    assert r["covered_version"] == tx_version(root)
    assert _indexed_through(idx) == tx_version(root)
    # catch-up over the delete gap is a full rebuild of the live
    # snapshot, so there is nothing stale left for the vacuum
    assert r["vacuum"]["stale_rows"] == 0
    live = tx_read(spark, root).count()
    assert tx_read(spark, idx).count() == live * 16
    assert r["compacted"]  # max_files=1 forces the recluster

    r2 = sigidx_maintain(
        spark, root, idx, min_stale_ratio=0.2, max_files=64
    )
    assert r2["covered_version"] == r["covered_version"]
    assert not r2["vacuum"]["vacuumed"] and not r2["compacted"]


def test_maintain_and_vacuum_from_t0_on_fresh_roots(spark, tmp_path, batches):
    """The documented scheduler loop (ingest → vacuum / maintain) must
    be runnable from t=0: on a fresh corpus AND index — no commits
    anywhere — maintain/vacuum are zero-stats no-ops, not crashes
    (r10: the index tx_read sat outside the guard and died with
    FileNotFoundError before the first ingest)."""
    from tabata_spark.operators.sigidx import sigidx_maintain, sigidx_vacuum

    root, idx = str(tmp_path / "fresh"), str(tmp_path / "fresh_sig")

    vac = sigidx_vacuum(spark, root, idx)
    assert vac == {
        "total_rows": 0,
        "stale_rows": 0,
        "stale_ratio": 0.0,
        "vacuumed": False,
        "version": 0,
    }
    r = sigidx_maintain(spark, root, idx)
    assert r["covered_version"] == 0
    assert r["vacuum"]["total_rows"] == 0 and not r["vacuum"]["vacuumed"]
    assert not r["compacted"]

    # the loop then proceeds normally from the first real ingest
    b1, _, _ = batches
    d1 = spark.createDataFrame(b1[:40], "doc_id string, text string")
    dedup_ingest_batch_indexed(spark, root, idx, d1, txn="t0")
    r2 = sigidx_maintain(spark, root, idx)
    assert r2["covered_version"] == tx_version(root) > 0
    assert r2["vacuum"]["total_rows"] > 0


def test_vacuum_on_emptied_index_is_noop(spark, tmp_path, batches):
    """An index whose snapshot was emptied (a delete-all followed by a
    full vacuum) is also a zero-stats no-op on the NEXT vacuum — the
    other half of the r10 crash class (ValueError from tx_read on an
    empty snapshot)."""
    from tabata_spark.operators.sigidx import sigidx_vacuum
    from tabata_spark.sources.txlog import tx_delete_where

    b1, _, _ = batches
    root, idx = str(tmp_path / "e"), str(tmp_path / "e_sig")
    d1 = spark.createDataFrame(b1[:30], "doc_id string, text string")
    dedup_ingest_batch_indexed(spark, root, idx, d1, txn="t0")
    tx_delete_where(spark, root, F.lit(True))  # corpus emptied
    # stale entries are CORRECT to keep until vacuum; the first vacuum
    # sees 100% staleness and rewrites the index down to empty
    vac1 = sigidx_vacuum(spark, root, idx)
    assert vac1["vacuumed"] and vac1["stale_ratio"] == 1.0
    # the next idle-loop vacuum hits the emptied snapshot: no-op
    vac2 = sigidx_vacuum(spark, root, idx)
    assert vac2["total_rows"] == 0 and not vac2["vacuumed"]


def test_indexed_ingest_over_object_store_log(spark, tmp_path, batches):
    """Composition pin: the indexed ingest pipeline (corpus txlog +
    signature-index txlog, exactly-once txn tokens, catch-up) runs
    with BOTH tables' logs living entirely in an object store
    (tx_set_log_store) — no _txlog directory anywhere. The geometry
    meta sidecar is the one deliberate filesystem file (static JSON,
    no concurrency semantics needed)."""
    import os

    from tabata_spark.sources.objectstore import (
        InMemoryObjectStore,
        ObjectStoreLogStore,
    )
    from tabata_spark.sources.txlog import tx_set_log_store

    b1, b2, _ = batches
    root, idx = str(tmp_path / "os"), str(tmp_path / "os_sig")
    store = InMemoryObjectStore()
    tx_set_log_store(root, ObjectStoreLogStore(store))
    tx_set_log_store(idx, ObjectStoreLogStore(store))
    try:
        d1 = spark.createDataFrame(b1[:60], "doc_id string, text string")
        d2 = spark.createDataFrame(b2[:40], "doc_id string, text string")
        dedup_ingest_batch_indexed(spark, root, idx, d1, txn="t0")
        # replay of the same txn is swallowed end to end
        dedup_ingest_batch_indexed(spark, root, idx, d1, txn="t0")
        dedup_ingest_batch_indexed(spark, root, idx, d2, txn="t1")
        kept = tx_read(spark, root).count()
        assert 0 < kept <= 100
        assert tx_read(spark, idx).count() == kept * 16  # bands rows
        assert _indexed_through(idx) == tx_version(root)
        # the logs never touched the filesystem
        assert not os.path.exists(os.path.join(root, "_txlog"))
        assert not os.path.exists(os.path.join(idx, "_txlog"))
        assert any(k.endswith(".json") for k in store.list_prefix(""))
    finally:
        tx_set_log_store(root, None)
        tx_set_log_store(idx, None)
