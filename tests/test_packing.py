import pytest
from pyspark.sql import functions as F

from tabata_spark.operators.packing import contamination_flags, pack_sequences


def test_contamination_detects_planted_overlap(spark):
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma something else entirely"),  # shares 'alpha beta gamma'
            (1, "totally unrelated words here only"),
            (2, "delta epsilon alpha nothing more"),  # no full 3-gram overlap
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hit"], r["contaminated"])
        for r in contamination_flags(docs, ev).collect()
    }
    assert got[0] == (1, True)
    assert got[1] == (0, False)
    assert got[2][1] is False  # 'delta epsilon alpha' not in eval shingles


def test_pack_sequences_prefix_sum_invariants(spark):
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
    )
    out = pack_sequences(docs, budget=16, n_shards=4).collect()
    assert len(out) == 500
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        assert 0 <= r["chunk_offset"] < 16
        assert r["start_offset"] == r["chunk"] * 16 + r["chunk_offset"]
        by_shard.setdefault(r["shard"], []).append(r)
    # within each shard, offsets tile exactly: sorted by start_offset,
    # each doc starts where the previous ended
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_offset"])
        pos = 0
        for r in rows:
            assert r["start_offset"] == pos
            pos += r["n_tokens"]


def test_pack_sequences_stable_under_repartition(spark):
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5 + 1).alias("n_tokens")
    )
    a = {r["doc_id"]: r["start_offset"] for r in pack_sequences(docs).collect()}
    b = {
        r["doc_id"]: r["start_offset"]
        for r in pack_sequences(docs.repartition(13)).collect()
    }
    assert a == b


def test_length_batches_sharded_no_global_sort_and_sane(spark):
    """Sharded mode: per-shard ntile inside one hash partitioning (no
    single-partition global window), batch sizes respected, batch ids
    unique across shards, and every batch is length-homogeneous
    relative to its shard's quantiles."""
    from pyspark.sql import functions as F

    from tabata_spark.operators.packing import length_grouped_batches

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("w"), (F.pmod("id", 97) + 3).cast("int"))
        ).alias("text"),
    )
    out = length_grouped_batches(
        docs, batch_size=16, n_length_groups=4, n_shards=8
    )
    rows = out.collect()
    assert len(rows) == 2000
    assert len({r["shard"] for r in rows}) == 8
    # batches hold <= batch_size docs and are unique across shards
    from collections import Counter, defaultdict

    per_batch = Counter(r["batch_id"] for r in rows)
    assert max(per_batch.values()) <= 16
    owner = {}
    for r in rows:
        key = r["batch_id"]
        assert owner.setdefault(key, (r["shard"], r["length_group"])) == (
            r["shard"],
            r["length_group"],
        )
    # within a (shard, group), token lengths never overlap a LATER group
    bounds = defaultdict(lambda: (10**9, -1))
    for r in rows:
        lo, hi = bounds[(r["shard"], r["length_group"])]
        bounds[(r["shard"], r["length_group"])] = (
            min(lo, r["n_tokens"]),
            max(hi, r["n_tokens"]),
        )
    for (sh, g), (lo, hi) in bounds.items():
        nxt = bounds.get((sh, g + 1))
        if nxt:
            assert hi <= nxt[0]
    # the global window disappears: plan has no single-partition
    # ntile (every Window partitions by shard)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "shard" in m.group(1), m.group(0)[:120]
