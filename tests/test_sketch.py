"""Count-min and Bloom sketches (operators/sketch.py).

The battery oracles (sketch_cms_tokens, sketch_bloom_customers) pin
engine parity; these tests pin the sketch contracts: CMS never
underestimates and merges associatively; Bloom has zero false
negatives and merges by union.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tabata_spark.operators.sketch import (
    bloom_build,
    bloom_might_contain,
    cms_build,
    cms_estimate,
    cms_merge,
)


def _keys(spark, values):
    return spark.createDataFrame([(v,) for v in values], "k string")


def test_cms_never_underestimates(spark):
    data = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + [f"x{i}" for i in range(200)]
    df = _keys(spark, data)
    sk = cms_build(df, "k", depth=4, width=64)  # tight width => collisions
    exact = {"a": 50, "b": 20, "c": 5}
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(
            sk, _keys(spark, list(exact)), "k", depth=4, width=64
        ).collect()
    }
    for k, n in exact.items():
        assert est[k] >= n


def test_cms_merge_equals_single_build(spark):
    a = ["a"] * 7 + ["b"] * 3 + ["z"]
    b = ["a"] * 2 + ["c"] * 4
    merged = cms_merge(
        cms_build(_keys(spark, a), "k", depth=3, width=32),
        cms_build(_keys(spark, b), "k", depth=3, width=32),
    )
    single = cms_build(_keys(spark, a + b), "k", depth=3, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )


def test_bloom_no_false_negatives(spark):
    members = [f"m{i}" for i in range(300)]
    bloom = bloom_build(_keys(spark, members), "k", m_bits=4096, k=4)
    probe = members + [f"q{i}" for i in range(300)]
    out = {
        r["k"]: r["might_contain"]
        for r in bloom_might_contain(
            bloom, _keys(spark, probe), "k", m_bits=4096, k=4
        ).collect()
    }
    assert all(out[m] for m in members)
    # with m=4096, k=4, n=300 the fp rate is ~0.2% — most non-members
    # must come back negative (deterministic, so this cannot flake)
    neg = sum(1 for i in range(300) if not out[f"q{i}"])
    assert neg >= 290


def test_bloom_masks_are_positive(spark):
    # every stored word is a positive OR of 1<<(p%31) masks — no
    # sign-bit traffic that could diverge cross-engine
    bloom = bloom_build(_keys(spark, [f"m{i}" for i in range(50)]), "k")
    bad = bloom.filter(F.col("bits") <= 0).count()
    assert bad == 0


def test_cms_upsert_incremental_equals_oneshot(spark, tmp_path):
    from tabata_spark.operators.sketch import cms_upsert, load_cms

    a = _keys(spark, ["a"] * 9 + ["b"] * 4)
    b = _keys(spark, ["a"] * 1 + ["c"] * 6)
    store = str(tmp_path / "cms")
    cms_upsert(spark, store, a, "k", depth=3, width=32)
    cms_upsert(spark, store, b, "k", depth=3, width=32)
    inc = sorted(map(tuple, load_cms(spark, store).collect()))
    one = sorted(
        map(
            tuple,
            cms_build(
                _keys(spark, ["a"] * 10 + ["b"] * 4 + ["c"] * 6),
                "k",
                depth=3,
                width=32,
            ).collect(),
        )
    )
    assert inc == one


def test_cms_upsert_rejects_geometry_mismatch(spark, tmp_path):
    # An xxhash64 (or resized/resalted) probe of an md5-built store
    # would silently break the never-underestimate guarantee — the
    # _cms_meta.json sidecar must make it an error instead.
    import pytest

    from tabata_spark.operators.sketch import cms_upsert, load_cms

    a = _keys(spark, ["a"] * 5 + ["b"] * 3)
    store = str(tmp_path / "cms")
    cms_upsert(spark, store, a, "k", depth=3, width=32)
    with pytest.raises(ValueError, match="not comparable"):
        cms_upsert(spark, store, a, "k", depth=3, width=32, hasher="xxhash64")
    with pytest.raises(ValueError, match="not comparable"):
        cms_upsert(spark, store, a, "k", depth=3, width=64)
    with pytest.raises(ValueError, match="not comparable"):
        load_cms(spark, store, depth=3, width=32, salt="cms", hasher="xxhash64")
    # hasher-only probe validates that one axis (the exact mismatch
    # the sidecar exists to catch — review finding r7)
    with pytest.raises(ValueError, match="not comparable"):
        load_cms(spark, store, hasher="xxhash64")
    # partial matching params don't spuriously fail on unfilled ones
    assert load_cms(spark, store, depth=3, width=32).count() > 0
    assert load_cms(spark, store, depth=3, width=32, salt="cms", hasher="md5").count() > 0


def test_stream_cms_maintain_matches_batch_and_is_replay_safe(spark, tmp_path):
    from tabata_spark.operators.sketch import load_cms
    from tabata_spark.streaming.sinks import stream_cms_maintain

    rows = [(i, f"k{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k string")
    src = str(tmp_path / "src")
    df.repartition(3, F.pmod("id", F.lit(3))).write.parquet(src)
    store = str(tmp_path / "cms")
    ck = str(tmp_path / "ck")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_cms_maintain(stream, store, ck, "k", depth=3, width=16)
    q.awaitTermination()
    got = sorted(map(tuple, load_cms(spark, store).collect()))
    want = sorted(
        map(tuple, cms_build(df, "k", depth=3, width=16).collect())
    )
    assert got == want
    # replay: a second identical run (fresh checkpoint, same ledger)
    # must be a no-op thanks to the batch markers
    ck2 = str(tmp_path / "ck2")
    stream2 = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = stream_cms_maintain(stream2, store, ck2, "k", depth=3, width=16)
    q2.awaitTermination()
    again = sorted(map(tuple, load_cms(spark, store).collect()))
    assert again == want


def test_ddsketch_relative_error_and_merge(spark):
    import math

    from tabata_spark.operators.sketch import (
        ddsketch_build,
        ddsketch_merge,
        ddsketch_quantiles,
    )

    vals = [0.5 + 0.37 * i for i in range(1, 1001)]  # 0.87 .. 370.5
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sk = ddsketch_build(df, "v", gamma=1.02)
    row = ddsketch_quantiles(sk, [0.5, 0.99], gamma=1.02).collect()[0]
    exact50 = sorted(vals)[math.ceil(0.5 * len(vals)) - 1]
    exact99 = sorted(vals)[math.ceil(0.99 * len(vals)) - 1]
    assert abs(row["p50"] - exact50) / exact50 <= 0.02
    assert abs(row["p99"] - exact99) / exact99 <= 0.02
    # merge of two halves == sketch of the whole (exact counters)
    h1 = ddsketch_build(
        spark.createDataFrame([(v,) for v in vals[:500]], "v double"), "v"
    )
    h2 = ddsketch_build(
        spark.createDataFrame([(v,) for v in vals[500:]], "v double"), "v"
    )
    merged = sorted(map(tuple, ddsketch_merge(h1, h2).collect()))
    whole = sorted(map(tuple, ddsketch_build(df, "v").collect()))
    assert merged == whole


def test_cms_xxhash_prod_path_contract(spark):
    """The production xxhash64 path upholds the same CMS contract
    (never underestimates); buckets differ from md5 by design."""
    from tabata_spark.operators.sketch import cms_build, cms_estimate

    data = ["a"] * 30 + ["b"] * 10 + [f"x{i}" for i in range(100)]
    df = _keys(spark, data)
    sk = cms_build(df, "k", depth=4, width=64, hasher="xxhash64")
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(
            sk, _keys(spark, ["a", "b"]), "k", depth=4, width=64, hasher="xxhash64"
        ).collect()
    }
    assert est["a"] >= 30 and est["b"] >= 10


def test_kmv_exact_below_k_and_estimate_above(spark):
    from tabata_spark.operators.sketch import kmv_build, kmv_estimate

    small = _keys(spark, [f"s{i}" for i in range(40)])
    sk = kmv_build(small, "k", k=256)
    row = kmv_estimate(sk, k=256).collect()[0]
    assert row["n_kept"] == 40 and row["est_distinct"] == 40.0

    big = _keys(spark, [f"key{i}" for i in range(20000)] * 2)  # dups collapse
    est = kmv_estimate(kmv_build(big, "k", k=256), k=256).collect()[0]
    assert abs(est["est_distinct"] - 20000) / 20000 < 0.15  # ~1/sqrt(k)


def test_kmv_two_phase_equals_direct_topk(spark):
    from pyspark.sql import functions as F

    from tabata_spark.operators.sketch import kmv_build, kmv_hash

    df = _keys(spark, [f"x{i}" for i in range(5000)])
    got = sorted(r["h"] for r in kmv_build(df, "k", k=128).collect())
    direct = [
        r["h"]
        for r in df.select(kmv_hash(F.col("k")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(128)
        .collect()
    ]
    assert got == direct


def test_kmv_merge_equals_build_on_union(spark):
    from tabata_spark.operators.sketch import kmv_build, kmv_merge

    a = _keys(spark, [f"a{i}" for i in range(3000)])
    b = _keys(spark, [f"b{i}" for i in range(3000)])
    merged = sorted(
        r["h"] for r in kmv_merge(
            kmv_build(a, "k", k=64), kmv_build(b, "k", k=64), k=64
        ).collect()
    )
    direct = sorted(
        r["h"] for r in kmv_build(a.unionByName(b), "k", k=64).collect()
    )
    assert merged == direct  # sketch-of-union == union-of-sketches


def test_kmv_set_ops_recovers_planted_overlap(spark):
    from tabata_spark.operators.sketch import kmv_build, kmv_set_ops

    # |A| = 4000, |B| = 4000, |A ∩ B| = 2000 → union 6000, jaccard 1/3
    a = _keys(spark, [f"shared{i}" for i in range(2000)] + [f"a{i}" for i in range(2000)])
    b = _keys(spark, [f"shared{i}" for i in range(2000)] + [f"b{i}" for i in range(2000)])
    row = kmv_set_ops(
        kmv_build(a, "k", k=256), kmv_build(b, "k", k=256), k=256
    ).collect()[0]
    assert abs(row["est_union"] - 6000) / 6000 < 0.15
    assert abs(row["jaccard"] - 1 / 3) < 0.1
    assert abs(row["est_intersection"] - 2000) / 2000 < 0.3


def test_bloom_filtered_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from tabata_spark.operators.sketch import bloom_filtered_join

    big = spark.range(5000).select(
        F.col("id"), (F.col("id") % 97).alias("key"), F.lit(1).alias("v")
    ).withColumnRenamed("key", "k").withColumn("k", F.concat(F.lit("k"), F.col("k")))
    small = spark.createDataFrame(
        [(f"k{i}", i * 10) for i in (3, 7, 11, 13)], "k string, w long"
    )
    got = sorted(
        map(tuple, bloom_filtered_join(big, small, "k", m_bits=4096, k=4).collect())
    )
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want and len(want) > 0
    # join types that keep unmatched big-side rows must be refused —
    # the prefilter would silently drop them (review finding r7)
    import pytest

    for how in ("left", "full", "left_anti"):
        with pytest.raises(ValueError, match="inner/left_semi"):
            bloom_filtered_join(big, small, "k", how=how)


def test_bloom_filtered_join_prefilters_before_join(spark):
    from pyspark.sql import functions as F

    from tabata_spark.operators.sketch import bloom_filtered_join

    big = spark.range(10000).select(
        F.concat(F.lit("k"), F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([("k1", 1), ("k2", 2)], "k string, w long")
    out = bloom_filtered_join(big, small, "k", m_bits=1 << 14, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the bitmap side must be broadcast and the probe filter must sit
    # below the key join (a Filter containing the bitmap map access)
    assert "BroadcastExchange" in plan
    assert plan.count("shiftleft") >= 5  # k probe masks at scan stage
    # semantics: equality with the plain join
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, big.join(small, "k").collect())
    )


def test_bloom_filtered_join_xxhash_prod_path_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from tabata_spark.operators.sketch import bloom_filtered_join

    big = spark.range(8000).select(
        F.concat(F.lit("k"), F.col("id") % 400).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(f"k{i}", i) for i in (5, 17, 230)], "k string, w long"
    )
    got = sorted(
        map(
            tuple,
            bloom_filtered_join(
                big, small, "k", m_bits=1 << 14, k=5, hasher="xxhash64"
            ).collect(),
        )
    )
    assert got == sorted(map(tuple, big.join(small, "k").collect()))


def test_ddsketch_zero_values_use_the_zero_bucket(spark):
    """Nonpositive values must land in DD_ZERO_BUCKET (estimate 0.0),
    never NULL buckets or ln(0) errors — first seen in the round-13
    sf0.1 sweep, where 6 zero-valued events NULL-bucketed Spark-side
    and blew up the SQL replay's ln()."""
    from pyspark.sql import functions as F

    from tabata_spark.operators.sketch import (
        DD_ZERO_BUCKET,
        ddsketch_build,
        ddsketch_quantiles,
    )

    # half the rows are zero, a couple negative: p50 must be exactly
    # 0.0; p99 must estimate the positive tail within gamma error
    vals = [0.0] * 50 + [-1.5] * 2 + [100.0] * 48
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sk = ddsketch_build(df, "v", gamma=1.02)
    buckets = {r["bucket"] for r in sk.collect()}
    assert DD_ZERO_BUCKET in buckets
    assert None not in buckets
    row = ddsketch_quantiles(sk, [0.5, 0.99], gamma=1.02).collect()[0]
    assert row["p50"] == 0.0
    assert abs(row["p99"] - 100.0) / 100.0 <= 0.02 + 1e-9
    # all-positive data: the zero bucket never appears (bit-identical
    # to the pre-round-13 sketch for the positive domain)
    pos = ddsketch_build(df.filter(F.col("v") > 0), "v", gamma=1.02)
    assert DD_ZERO_BUCKET not in {r["bucket"] for r in pos.collect()}
