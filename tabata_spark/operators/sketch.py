"""Mergeable frequency/membership sketches: count-min and Bloom.

Sibling to the HLL distinct-count rollup (operators/rollup.py): the
sketch IS the state you keep at 100 TB — counters/bitmaps a few KB-MB
large that merge associatively across partitions, days, and clusters,
while the raw keys never need to be co-located or re-scanned.

- Count-min: a (depth x width) counter table. Build = one groupBy
  over (row, bucket) pairs — map-side combinable, output bounded by
  depth*width regardless of corpus size. Merge = union + sum.
  Estimate = min over rows of the key's counters (classic one-sided
  overestimate; never under).

- Bloom: a bitmap as (word_idx, bits) rows — build = bit_or per
  word, bounded by m_bits/31 rows. The 100 TB use: replace a
  semi-join against a billion-key set with a broadcast of a few MB
  of bitmap; zero false negatives, tunable false positives.

Determinism / oracle story: all hash positions derive from salted
md5 (the engine-portable construction of operators/sampling.py
hash_bucket), counters are exact integer sums, and bit_or is
order-independent — so both sketches are bit-identical under any
partitioning and replayable in any SQL engine with md5.

Reference parity: no sketch layer exists in the reference; this is
the beyond-reference scale toolkit (SURVEY.md north-star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tabata_spark.operators.sampling import hash_bucket

#: bits per bitmap word — 31 keeps every mask a positive INT32/INT64
#: in both engines (1 << 62|63 is overflow-fraught cross-engine)
_WORD_BITS = 31


def _cms_bucket(width: int, salt: str, hasher: str) -> "Column":
    """Bucket for the (row, key) pair. ``hasher='md5'`` is the
    engine-portable parity construction (the DuckDB oracle replays
    it); ``'xxhash64'`` is the production fast path — one JVM hash
    call instead of an md5 + hex-conv chain (the same prod/parity
    split as dedup.simhash)."""
    joined = F.concat_ws(
        "#", F.col("row").cast("string"), F.col("__k").cast("string")
    )
    if hasher == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(salt), joined), F.lit(width))
    return hash_bucket(joined, width, salt=salt)


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    hasher: str = "md5",
) -> DataFrame:
    """Count-min sketch of the key column's frequencies.

    Returns (row, bucket, c) — at most depth*width rows, mergeable
    with :func:`cms_merge`. Build and estimate must use the same
    ``hasher`` (see :func:`_cms_bucket`)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    pairs = df.select(F.col(key_col).alias("__k")).select("__k", rows)
    return (
        pairs.withColumn("bucket", _cms_bucket(width, salt, hasher))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two count-min sketches built with identical geometry."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    hasher: str = "md5",
) -> DataFrame:
    """Point-estimate each key's count: min over the sketch rows.

    The sketch is broadcast (it is at most depth*width rows); the key
    table is scanned once."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    probes = (
        keys.select(F.col(key_col).alias("__k"), rows)
        .withColumn("bucket", _cms_bucket(width, salt, hasher))
        .withColumnRenamed("__k", key_col)
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


def _bloom_positions(
    key: Column, m_bits: int, k: int, salt: str, hasher: str = "md5"
) -> Column:
    """Array of k bit positions for a key. ``'md5'`` is the
    engine-portable parity construction (DuckDB replays it);
    ``'xxhash64'`` is the production fast path — one JVM hash call per
    probe instead of an md5 + hex-conv chain (the CMS/simhash
    prod/parity split)."""
    if hasher == "xxhash64":
        return F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.pmod(
                F.xxhash64(F.lit(salt), i, key.cast("string")), F.lit(m_bits)
            ),
        )
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: hash_bucket(
            F.concat_ws("#", i.cast("string"), key.cast("string")),
            m_bits,
            salt=salt,
        ),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 5,
    salt: str = "bloom",
    hasher: str = "md5",
) -> DataFrame:
    """Bloom filter of the key set as (word_idx, bits) rows —
    at most ceil(m_bits/31) rows, mergeable by bit_or. Build and
    probe must share ``hasher`` (see :func:`_bloom_positions`)."""
    pos = df.select(
        F.explode(
            F.array_distinct(
                _bloom_positions(F.col(key_col), m_bits, k, salt, hasher)
            )
        ).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / _WORD_BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(p % {_WORD_BITS} as int))").alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 5,
    salt: str = "bloom",
    hasher: str = "md5",
) -> DataFrame:
    """Membership probe: adds ``might_contain`` (no false negatives —
    PROVIDED the probe uses the same ``hasher`` (and m_bits/k/salt)
    as the build; mismatched positions silently break the guarantee).

    The bitmap is broadcast; the probe side is scanned once and
    re-aggregated on its own key."""
    probes = df.select(F.col(key_col)).withColumn(
        "p", F.explode(_bloom_positions(F.col(key_col), m_bits, k, salt, hasher))
    )
    hit = probes.select(
        key_col,
        (F.col("p") / _WORD_BITS).cast("long").alias("word_idx"),
        F.expr(f"shiftleft(1L, cast(p % {_WORD_BITS} as int))").alias("m"),
    ).join(F.broadcast(bloom), "word_idx", "left")
    return (
        hit.groupBy(key_col)
        .agg(
            F.min(
                F.when(
                    F.coalesce(F.expr("bits & m"), F.lit(0)) != 0, 1
                ).otherwise(0)
            ).alias("__all")
        )
        .select(key_col, (F.col("__all") == 1).alias("might_contain"))
    )


def _cms_meta_path(store_path: str) -> str:
    # SIBLING of the store directory, not inside it: an overwrite
    # write deletes the whole directory first, and a crash between
    # that delete and a sidecar rewrite would silently strip the
    # store of its geometry record — permanently disabling the
    # validation the sidecar exists for
    return store_path.rstrip("/") + ".meta.json"


def _cms_check_meta(store_path: str, geometry: dict) -> None:
    """Validate a stored sketch's geometry sidecar against the
    caller's parameters. Counters bucketed under one (hasher, salt,
    depth, width) are meaningless under another — a probe or upsert
    with mismatched geometry silently returns/merges wrong counts and
    breaks the never-underestimate guarantee, so mismatch is an
    error, not a warning.

    Only the keys PRESENT in ``geometry`` are compared, so a caller
    checking just ``hasher='xxhash64'`` validates that one axis (and
    unfilled parameters don't spuriously fail against the stored
    values)."""
    import json
    import os

    p = _cms_meta_path(store_path)
    if not os.path.exists(p):
        return
    with open(p) as f:
        stored = json.load(f)
    bad = {
        k: (stored.get(k), v)
        for k, v in geometry.items()
        if k in stored and stored[k] != v
    }
    if bad:
        raise ValueError(
            f"CMS store {store_path} was built with "
            f"{ {k: s for k, (s, _) in bad.items()} }, called with "
            f"{ {k: g for k, (_, g) in bad.items()} } — counters are "
            "not comparable across geometries"
        )


def cms_upsert(
    spark,
    store_path: str,
    batch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    hasher: str = "md5",
) -> None:
    """Fold a batch into a stored count-min sketch (parquet).

    The store is at most depth*width rows, so the merge is a tiny
    union+sum; the merged frame is eagerly materialized
    (localCheckpoint) BEFORE the overwrite so the write never races
    its own input scan. Work per upsert is O(batch) + O(sketch),
    never O(history) — the whole point of keeping the sketch.

    The sketch's geometry (depth/width/salt/hasher) is persisted in a
    ``_cms_meta.json`` sidecar and validated on every upsert — an
    xxhash64 probe of an md5-built store raises instead of silently
    returning wrong estimates."""
    import json
    import os

    geometry = {"depth": depth, "width": width, "salt": salt, "hasher": hasher}
    _cms_check_meta(store_path, geometry)
    part = cms_build(batch, key_col, depth, width, salt, hasher)
    if not part.head(1):
        return
    # claim the geometry BEFORE the data write (atomic tmp+replace):
    # a crash after the overwrite but before a later sidecar write
    # would otherwise leave counters with no geometry record
    meta = _cms_meta_path(store_path)
    if not os.path.exists(meta):
        tmp = meta + ".tmp"
        with open(tmp, "w") as f:
            json.dump(geometry, f)
        os.replace(tmp, meta)
    if os.path.isdir(store_path) and any(
        f.endswith(".parquet") for f in os.listdir(store_path)
    ):
        stored = spark.read.parquet(store_path)
        part = cms_merge(part, stored)
    part.localCheckpoint(eager=True).write.mode("overwrite").parquet(store_path)


def load_cms(
    spark,
    store_path: str,
    depth: int | None = None,
    width: int | None = None,
    salt: str | None = None,
    hasher: str | None = None,
) -> DataFrame:
    """Read a stored count-min sketch. Pass whichever geometry
    parameters you intend to probe with (the same values you will
    give :func:`cms_estimate`) — each PROVIDED parameter is validated
    against the store's sidecar, so ``load_cms(spark, p,
    hasher='xxhash64')`` checks exactly the axis that matters without
    requiring the rest."""
    provided = {
        k: v
        for k, v in (
            ("depth", depth), ("width", width), ("salt", salt), ("hasher", hasher)
        )
        if v is not None
    }
    if provided:
        _cms_check_meta(store_path, provided)
    return spark.read.parquet(store_path)


#: dedicated bucket for nonpositive values — the reference DDSketch's
#: zero counter (the log bucket map is only defined for x > 0). A
#: sentinel far below any reachable log bucket (|ceil(ln x/ln γ)| <
#: ~2^40 for any finite double) keeps it FIRST in bucket order, which
#: is exactly the rank position zeros occupy in nonnegative data.
DD_ZERO_BUCKET = -(1 << 62)


def ddsketch_build(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
    gamma: float = 1.02,
) -> DataFrame:
    """DDSketch (relative-error quantile sketch): bucket =
    ceil(ln(x)/ln(gamma)) for x > 0 — a log-scaled histogram whose
    quantile estimates carry a guaranteed (gamma-1) relative error.
    Nonpositive values land in the dedicated :data:`DD_ZERO_BUCKET`
    (the reference design's zero counter; estimate 0.0), so zeros in
    real telemetry cannot poison the log map — before round 13 a 0
    produced a NULL bucket Spark-side and a loud ln(0) error in the
    SQL replay (first seen in the sf0.1 sweep: 6 zero-valued events).
    Genuinely NEGATIVE data wants the classic mirrored second sketch;
    this collapses it to the zero bucket, documented. Counts per
    (key, bucket) are exact integers, so the sketch is DETERMINISTIC
    (unlike t-digest/KLL) and merges by union+sum; bucket count is
    bounded by the value's dynamic range (~log_gamma(max/min)),
    independent of row count. Completes the mergeable-state family:
    HLL (distinct), CMS (frequency), Bloom (membership), DD
    (quantiles)."""
    import math

    key_cols = key_cols or []
    v = F.col(value_col).cast("double")
    bucket = F.when(
        v > 0,
        F.ceil(F.log(v) / F.lit(math.log(gamma))).cast("long"),
    ).otherwise(F.lit(DD_ZERO_BUCKET).cast("long"))
    return (
        df.select(*key_cols, bucket.alias("bucket"))
        .groupBy(*key_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def ddsketch_merge(a: DataFrame, b: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Merge two DDSketches built with the same gamma."""
    key_cols = key_cols or []
    return (
        a.unionByName(b)
        .groupBy(*key_cols, "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def ddsketch_quantiles(
    sketch: DataFrame,
    qs: list[float],
    key_cols: list[str] | None = None,
    gamma: float = 1.02,
) -> DataFrame:
    """Quantile estimates from a DDSketch: rank = ceil(q*n) in exact
    integer arithmetic (q as a decimal fraction — the double product
    overshoots on representation error at exactly the boundary ranks);
    the answer is the midpoint value 2*gamma^b/(gamma+1) of the first
    bucket whose cumulative count reaches the rank. One window over
    the (tiny) bucket table per key."""
    from pyspark.sql import Window

    from tabata_spark.operators.ranking import exact_rank_of_quantile

    key_cols = key_cols or []
    wc = Window.partitionBy(*key_cols).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy(*key_cols) if key_cols else Window.partitionBy(F.lit(1))
    cum = sketch.select(
        *key_cols,
        "bucket",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for q in qs:
        rank = exact_rank_of_quantile(q, "n")
        b_q = F.min(F.when(F.col("cum") >= rank, F.col("bucket")))
        est = F.when(b_q == F.lit(DD_ZERO_BUCKET), F.lit(0.0)).otherwise(
            F.lit(2.0)
            * F.pow(F.lit(float(gamma)), b_q.cast("double"))
            / F.lit(float(gamma) + 1.0)
        )
        aggs.append(est.alias(f"p{int(round(q * 100)):02d}"))
    return cum.groupBy(*key_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the set-operations member of
# the mergeable family: HLL unions but cannot intersect; KMV supports
# union AND intersection estimates (Beyer et al., "On Synopses for
# Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007),
# which is what corpus-overlap questions need ("how much does crawl A
# share with crawl B?") without ever joining the raw key sets.
# ---------------------------------------------------------------------------

#: hash space of the 15-hex-digit md5 prefix — 16^15 = 2^60
_KMV_SPACE = float(1 << 60)


def kmv_hash(col: Column, salt: str = "kmv") -> Column:
    """Uniform 60-bit integer hash of a key — the engine-portable
    salted-md5 construction (DuckDB replays it digit for digit)."""
    s = F.concat_ws(":", F.lit(salt), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def kmv_build(
    df: DataFrame,
    key_col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
    salt: str = "kmv",
    n_shards: int = 64,
) -> DataFrame:
    """The k smallest distinct key hashes per group — a fixed-size
    (<= k rows/group) mergeable distinct sketch.

    Scale shape: two-phase sharded top-k. Phase 1 ranks within
    (group, hash % n_shards) — n_shards-way parallel, spill-safe
    external sorts — keeping k per shard; phase 2 ranks the <= k*S
    survivors per group. Provably equal to a direct global top-k
    (every global top-k hash is top-k within its own shard), which is
    what the DuckDB oracle replays in its simple one-window form.
    Returns (group_cols..., h)."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    hashed = (
        df.select(*group_cols, kmv_hash(F.col(key_col), salt).alias("h"))
        .distinct()
    )
    w1 = Window.partitionBy(
        *group_cols, F.pmod(F.col("h"), F.lit(n_shards))
    ).orderBy("h")
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= k)
        .select(*group_cols, "h")
    )


def kmv_merge(
    a: DataFrame,
    b: DataFrame,
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union of two KMV sketches built with the same k and salt:
    distinct-union the (tiny, <= 2k/group) hash sets and re-keep the k
    smallest — sketch-of-union == union-of-sketches, the mergeable-
    state property."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        a.unionByName(b)
        .distinct()
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select(*group_cols, "h")
    )


def kmv_estimate(
    sketch: DataFrame,
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate per group: exact when the sketch holds
    fewer than k hashes (every distinct key is present), else the
    classic (k-1) * SPACE / h_k estimator from the k-th minimum.
    Fixed-order double arithmetic, rounded to 4 — engine-exact."""
    group_cols = group_cols or []
    n = F.count(F.lit(1))
    hk = F.max("h")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / hk, 4)
    )
    return sketch.groupBy(*group_cols).agg(
        n.cast("long").alias("n_kept"), est.alias("est_distinct")
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    k: int = 256,
) -> DataFrame:
    """Union / intersection / Jaccard estimates between two ungrouped
    KMV sketches (the corpus-overlap question). The union sketch's k
    smallest hashes form a uniform sample of the union; the fraction
    of them present in BOTH input sketches estimates the Jaccard
    index, and intersection = jaccard * union (the SIGMOD 2007 KMV
    multiset estimator). All joins are over <= k-row frames."""
    u = kmv_merge(a, b, k)
    both = (
        u.join(a.select("h").distinct(), "h", "left_semi")
        .join(b.select("h").distinct(), "h", "left_semi")
    )
    stats = u.agg(
        F.count(F.lit(1)).cast("long").alias("k_eff"),
        F.max("h").alias("hk"),
    ).crossJoin(both.agg(F.count(F.lit(1)).cast("long").alias("c")))
    est_u = F.when(
        F.col("k_eff") < k, F.col("k_eff").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("hk"), 4))
    return stats.select(
        "k_eff",
        "c",
        est_u.alias("est_union"),
        F.round(F.col("c").cast("double") / F.col("k_eff"), 6).alias(
            "jaccard"
        ),
        F.round(
            F.round(F.col("c").cast("double") / F.col("k_eff"), 6) * est_u, 4
        ).alias("est_intersection"),
    )


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    how: str = "inner",
    salt: str = "bloom",
    hasher: str = "md5",
) -> DataFrame:
    """Equi-join with a Bloom pre-filter on the big side — the
    shuffle-volume reducer for selective joins at 100 TB: the small
    side's key set becomes a broadcast bitmap (a few hundred KB at
    m=2^20), and big-side rows whose keys cannot be in the set are
    dropped AT THE SCAN STAGE, before any shuffle. Zero false
    negatives (Bloom's guarantee) makes the result IDENTICAL to the
    plain join — false positives only cost wasted shuffle rows, bounded
    by the classic (1-e^{-kn/m})^k rate. This is the hand-rolled,
    engine-portable twin of Spark's runtime bloom-filter injection
    (spark.sql.optimizer.runtime.bloomFilter.*), usable when the
    optimizer declines (disjoint stages, non-obvious selectivity) and
    replayable as a plain join by any SQL oracle.

    Plan shape: bitmap aggregation over the small side (bounded by
    m_bits/31 rows) -> one-row broadcast -> k salted-md5 probes as
    scan-stage column expressions -> filter -> ordinary join.

    Only ``inner`` and ``left_semi`` are accepted: any join type that
    keeps unmatched big-side rows (left/full/anti) would have them
    silently dropped by the prefilter — a wrong answer, not a slow
    one."""
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(
            f"bloom_filtered_join supports inner/left_semi, got {how!r}: "
            "the prefilter drops unmatched big-side rows, which any "
            "outer/anti join type must keep"
        )
    bloom = bloom_build(
        small.select(key_col).distinct(), key_col, m_bits, k, salt, hasher
    )
    bitmap = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word_idx"), F.col("bits")))
        ).alias("__bm")
    )
    # the k salted-hash probes are scan-stage CPU on the big side; a
    # single-row-group input would run them on one core (r16 measured
    # 4.4 s -> 1.6 s at sf0.1) — spread_scan is a no-op whenever the
    # big side already has enough splits (always, at scale)
    from tabata_spark.operators.spread import spread_scan

    probed = spread_scan(big).join(F.broadcast(bitmap))
    test = F.lit(True)
    pcols = []
    for i in range(k):
        pc = f"__blp{i}"
        pcols.append(pc)
        if hasher == "xxhash64":
            # must match _bloom_positions' transform probe i: the
            # sequence element is an INT column, so hash an int literal
            probe = F.pmod(
                F.xxhash64(
                    F.lit(salt), F.lit(i), F.col(key_col).cast("string")
                ),
                F.lit(m_bits),
            )
        else:
            probe = hash_bucket(
                F.concat_ws("#", F.lit(str(i)), F.col(key_col).cast("string")),
                m_bits,
                salt=salt,
            )
        probed = probed.withColumn(pc, probe)
        word = F.element_at(
            F.col("__bm"), (F.col(pc) / _WORD_BITS).cast("long")
        )
        mask = F.expr(f"shiftleft(1L, cast({pc} % {_WORD_BITS} as int))")
        test = test & (F.coalesce(word, F.lit(0)).bitwiseAND(mask) != 0)
    prefiltered = probed.filter(test).drop("__bm", *pcols)
    return prefiltered.join(small, key_col, how)
