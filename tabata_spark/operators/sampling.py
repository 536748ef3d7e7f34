"""Deterministic, engine-portable sampling & splitting (net-new
training-pipeline surface; no reference citation).

``df.sample`` is reproducible only within one engine+partitioning;
training pipelines instead key membership off a SALTED CONTENT HASH of
a stable id. Membership becomes a pure function of (id, salt):

- reproducible across engines, re-runs, and repartitioning;
- splits are disjoint by construction and keep their proportions as
  new data arrives (no global shuffle or state — a row's split never
  depends on other rows);
- verifiable bit-for-bit in any engine with md5 (the DuckDB oracle
  runs the identical expression);
- filter is a pure Column predicate evaluated in the scan stage —
  narrow (no shuffle, no state), trivially 100 TB-safe.

The hash is the first 15 hex chars of md5 (a 60-bit uniform int, same
construction as operators.dedup.md5_token_hash), reduced mod
``buckets``. 10,000 buckets give 0.01% split granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: str | Column, buckets: int = 10_000, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from a salted md5 of the
    value. DuckDB-portable:
    ``('0x' || substr(md5(salt || ':' || x::VARCHAR), 1, 15))::BIGINT
    % buckets``."""
    c = col if isinstance(col, Column) else F.col(col)
    s = F.concat_ws(":", F.lit(salt), c.cast("string"))
    h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "v1",
    buckets: int = 10_000,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by hash-bucket range.

    ``splits``: ordered {name: fraction} summing to ≤ 1 (remainder
    falls into the last split). Default 80/10/10 train/val/test.
    Adds ``bucket`` and ``out_col`` columns.
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = hash_bucket(id_col, buckets=buckets, salt=salt)
    out = df.withColumn("bucket", b)
    names = list(splits)
    expr = F.lit(names[-1])
    cum = 0.0
    conds = []
    for name, frac in list(splits.items())[:-1]:
        cum += frac
        conds.append((name, int(round(cum * buckets))))
    for name, hi in reversed(conds):
        expr = F.when(F.col("bucket") < hi, name).otherwise(expr)
    return out.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    fraction: float = 0.1,
    salt: str = "sample",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose salted hash
    bucket falls below ``fraction * buckets``. A pure pushdown-able
    predicate — independent samples compose by varying ``salt``."""
    return df.filter(
        hash_bucket(id_col, buckets=buckets, salt=salt)
        < int(round(fraction * buckets))
    )


def mixture_rebalance(
    df: DataFrame,
    strata_col: str,
    weight_col: str | Column = None,
    target: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "mix",
    buckets: int = 10_000,
    broadcast_strata: bool = True,
) -> DataFrame:
    """Downsample strata so the kept corpus approaches a TARGET
    mixture (default uniform) by weight (default rows; pass e.g. a
    token-count column to mix by tokens) — the domain-mixing step of
    a pre-training pipeline, with the per-stratum fractions DERIVED
    FROM THE DATA rather than supplied.

    For stratum s with observed weight w_s and target share t_s, the
    keep-fraction is ``min(1, t_s * C / w_s)`` where C = min over
    strata of w_s / t_s — i.e. the largest corpus achievable by pure
    downsampling (the most-underrepresented stratum is kept whole).
    Membership uses the same salted-hash bucket as
    :func:`stratified_hash_sample`, so the result is deterministic
    and engine-checkable.

    Plan shape: one tiny aggregation over strata (broadcast back) +
    the scan-stage hash predicate; no shuffle of the fact table. The
    corpus-wide scalars (stratum count, the limiting capacity C) are
    one-row aggregates joined back by broadcast — NOT global windows,
    which would funnel the strata frame through a single partition
    (harmless at this row count but a WindowExec warning magnet and a
    bad habit at scale).
    """
    w = F.lit(1) if weight_col is None else (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    )
    obs = df.groupBy(strata_col).agg(F.sum(w).alias("__w"))
    if target:
        tgt = F.lit(None).cast("double")
        for k, share in sorted(target.items()):
            tgt = F.when(F.col(strata_col) == k, F.lit(share)).otherwise(tgt)
        obs = obs.withColumn("__t", tgt).filter(F.col("__t").isNotNull())
    else:
        n_strata = obs.agg(F.count(F.lit(1)).alias("__n"))
        obs = obs.join(F.broadcast(n_strata)).withColumn(
            "__t", 1.0 / F.col("__n")
        )
    cap_df = obs.agg(F.min(F.col("__w") / F.col("__t")).alias("__cap"))
    # scale note: obs/frac are per-STRATUM aggregates (one row per
    # domain). Broadcast is right up to ~10M strata (tens of MB);
    # above that pass ``broadcast_strata=False`` and the join runs as
    # a shuffle (correct either way). This gate is a PARAMETER rather
    # than a measured byte estimate (the assoc pattern) on purpose:
    # measuring would require materializing the strata aggregate — a
    # full extra pass over the FACT table, which costs more at every
    # scale than the broadcast it guards; the caller knows its domain
    # cardinality.
    frac = obs.join(F.broadcast(cap_df)).select(
        strata_col,
        F.least(
            F.lit(1.0), F.col("__t") * F.col("__cap") / F.col("__w")
        ).alias("__keep"),
    )
    if broadcast_strata:
        frac = F.broadcast(frac)
    b = hash_bucket(id_col, buckets=buckets, salt=salt)
    return (
        df.join(frac, strata_col)
        .filter(b < F.col("__keep") * buckets)
        .drop("__keep")
    )


def mixture_temperature(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.7,
    weight_col: str | Column = None,
    id_col: str = "doc_id",
    salt: str = "temp",
    buckets: int = 10_000,
    broadcast_strata: bool = True,
) -> DataFrame:
    """Temperature-scaled mixture sampling (the mT5/XLM-R multilingual
    rebalancing rule): target share t_s ∝ w_s^alpha. alpha=1 keeps the
    natural mixture, alpha=0 is uniform (:func:`mixture_rebalance`'s
    default), 0<alpha<1 upsamples the tail RELATIVELY by downsampling
    heads less than proportionally.

    Keep-fraction derivation mirrors mixture_rebalance: the
    most-underrepresented stratum (max w_s/t_s deficit... i.e. min
    w_s/t_s capacity) is kept whole, everything else downsampled to
    ``min(1, t_s · C / w_s)`` with C = min_s w_s/t_s. Engine
    portability: pow(w, alpha) is quantized to DECIMAL(18,6) per
    stratum BEFORE the normalizing sum, so the normalizer is an exact
    decimal sum (order-independent) and the keep fraction is a fixed
    per-row double expression — deterministic in both engines.

    Plan shape: one tiny strata aggregation broadcast back + the
    scan-stage salted-hash predicate; the fact table never shuffles.
    """
    w = F.lit(1) if weight_col is None else (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    )
    obs = df.groupBy(strata_col).agg(F.sum(w).alias("__w"))
    tnum = (
        F.round(F.pow(F.col("__w").cast("double"), F.lit(float(alpha))), 6)
        .cast("decimal(18,6)")
    )
    obs = obs.withColumn("__tn", tnum)
    z = obs.agg(F.sum("__tn").cast("decimal(28,6)").alias("__z"))
    scored = obs.join(F.broadcast(z)).withColumn(
        "__t", F.col("__tn").cast("double") / F.col("__z").cast("double")
    )
    cap_df = scored.agg(F.min(F.col("__w") / F.col("__t")).alias("__cap"))
    frac = scored.join(F.broadcast(cap_df)).select(
        strata_col,
        F.least(
            F.lit(1.0), F.col("__t") * F.col("__cap") / F.col("__w")
        ).alias("__keep"),
    )
    # same parameterized gate rationale as mixture_rebalance: a
    # measured gate would re-scan the fact table; the caller knows
    # whether strata cardinality clears ~10M
    if broadcast_strata:
        frac = F.broadcast(frac)
    b = hash_bucket(id_col, buckets=buckets, salt=salt)
    return (
        df.join(frac, strata_col)
        .filter(b < F.col("__keep") * buckets)
        .drop("__keep")
    )


def pareto_quality_sample(
    df: DataFrame,
    score_col: str | Column,
    alpha: float = 9.0,
    id_col: str = "doc_id",
    salt: str = "pareto",
    buckets: int = 10_000,
) -> DataFrame:
    """GPT-3's stochastic quality gate: keep a document iff
    ``score > 1 - X`` with ``X ~ Pareto(alpha)`` — a soft threshold
    that keeps most high-score docs while letting a long tail of
    low-score docs through (diversity preservation; hard cutoffs
    overfit the quality model's biases).

    Deterministic twist: the Pareto draw comes from the salted-hash
    uniform ``u = (bucket + 0.5) / buckets`` through the inverse CDF
    ``X = (1 - u)^(-1/alpha) - 1`` — reproducible under repartitioning
    and engine-portable (the DuckDB oracle replays the identical
    arithmetic). Scan-stage predicate; no shuffle at any scale.
    """
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    u = (
        hash_bucket(id_col, buckets=buckets, salt=salt).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(buckets))
    x = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return df.filter(s > F.lit(1.0) - x)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "strata",
    buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing
    primitive (e.g. downsample 'en', keep all 'fr'). The per-row
    threshold is a CASE over ``strata_col``; the bucket hash uses only
    (salt, id), so changing a stratum's fraction widens/narrows its
    kept set monotonically (nested samples)."""
    thr = F.lit(int(round(default_fraction * buckets)))
    for k, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == k, F.lit(int(round(frac * buckets)))
        ).otherwise(thr)
    return df.filter(hash_bucket(id_col, buckets=buckets, salt=salt) < thr)


def top_fraction_per_stratum(
    df: DataFrame,
    frac: float,
    order_col: str | Column,
    strata_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Keep the best ``frac`` of each stratum by ``order_col`` — the
    per-domain quality-filtering step of a curation pipeline (a global
    threshold over-prunes weak domains and under-prunes strong ones).

    Membership is rank-based, not score-threshold-based, so the kept
    fraction is exact per stratum regardless of the score
    distribution; ties break on ``id_col`` for determinism. The kept
    rank ceil(frac·n) is exact INTEGER arithmetic (frac as a decimal
    fraction) — ``ceil`` on the double product overshoots when it
    lands epsilon above an integer (0.3·10 = 3.0000000000000004 in
    doubles → 4 rows kept instead of 3, and a SQL engine whose 0.3 is
    a DECIMAL disagrees). One window sort per stratum partition
    (single shuffle on the strata key); at 100 TB skewed strata are
    the concern — pre-salt or split hot domains upstream if one
    domain dominates the corpus."""
    from tabata_spark.operators.ranking import exact_rank_of_quantile

    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [oc.desc() if descending else oc.asc(), F.col(id_col)]
    w = Window.partitionBy(strata_col).orderBy(*order)
    # same sort, explicit unbounded frame (the ordered-window lesson:
    # a bare partitionBy window buffers whole groups, ~4× slower)
    n = (
        Window.partitionBy(strata_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        .filter(F.col("__rk") <= exact_rank_of_quantile(frac, "__n"))
        .drop("__rk", "__n")
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023,
    arXiv:2302.03169): score every document by how much its hashed
    unigram distribution looks like the ``target`` subset vs the raw
    corpus — ``weight(doc) = Σ_w log(p_target(b(w)) / p_raw(b(w)))``
    with ``b(w)`` the engine-portable salted-md5 bucket (hash_bucket)
    and add-alpha smoothed bucket distributions. High-weight docs are
    the ones importance resampling keeps when fitting a pretraining
    mixture toward the target domain.

    Hash-stability: each bucket log-ratio is quantized to
    DECIMAL(18,6) BEFORE the per-doc sum, so the summation is
    order-independent and engine-exact; the log's argument is a single
    division of integer-exact double products, identical in any IEEE
    engine.

    Plan: one explode → one bucket aggregation with a conditional
    target count (map-side combinable, ≤ n_buckets groups), scalars
    folded back via broadcast, then token ⋈ broadcast(bucket table)
    and one per-doc sum — linear end-to-end, no corpus² anywhere. At
    100 TB raise n_buckets (DSIR's own setting is 10⁴); the broadcast
    side stays n_buckets rows regardless of corpus size."""
    tok = df.select(
        F.col(id_col).alias("__id"),
        target.alias("__is_t"),
        F.explode(F.split(F.col(text), " ", -1)).alias("__w"),
    ).select(
        "__id", "__is_t", hash_bucket("__w", n_buckets, salt=salt).alias("__b")
    )
    bs = tok.groupBy("__b").agg(
        F.count(F.lit(1)).cast("double").alias("__cr"),
        F.count_if("__is_t").cast("double").alias("__ct"),
    )
    sc = bs.agg(F.sum("__cr").alias("__nr"), F.sum("__ct").alias("__nt"))
    ab = float(alpha) * n_buckets
    lr = F.log(
        ((F.col("__ct") + F.lit(float(alpha))) * (F.col("__nr") + F.lit(ab)))
        / ((F.col("__cr") + F.lit(float(alpha))) * (F.col("__nt") + F.lit(ab)))
    )
    blr = bs.join(F.broadcast(sc)).select(
        "__b", F.round(lr, 6).cast("decimal(18,6)").alias("__lr")
    )
    return (
        tok.join(F.broadcast(blr), "__b")
        .groupBy("__id")
        .agg(F.sum("__lr").cast("decimal(18,6)").alias("dsir_weight"))
        .select(F.col("__id").alias(id_col), "dsir_weight")
    )


def _cap_order(id_col: str, salt: str) -> list[Column]:
    """Deterministic per-domain ranking order: salted md5 of the id
    (engine-portable — DuckDB: ``md5(salt || ':' || id::VARCHAR)``)
    with the raw id as total tie-break."""
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    return [key, F.col(id_col)]


def domain_cap(
    df: DataFrame,
    domain: str = "source",
    id_col: str = "doc_id",
    cap: int = 100,
    salt: str = "",
    shards: int | None = None,
    weight: str | Column | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, chosen by deterministic
    salted-hash order — the per-domain quota step of web-corpus
    curation (downweight crawl-heavy hosts without losing coverage).

    Membership is a pure function of (id, salt): reproducible across
    engines, re-runs, and arrival order; nested (cap=K's survivors
    contain cap=K-1's, since ranks are stable).

    ``shards=None`` ranks each domain in ONE window partition — exact
    but skew-bound: a crawl-scale hot domain funnels through a single
    task. ``shards=k`` runs the exact two-phase plan instead:

    1. rank within (domain, shard(id)) and keep per-shard rank <= cap —
       every global top-``cap`` row survives (its shard-local rank is
       bounded by its global rank), and each window group holds only
       that shard's share of the domain;
    2. re-rank the <= shards*cap survivors per domain and keep
       rank <= cap.

    Phase 2's groups are bounded by shards*cap rows REGARDLESS of
    domain skew, so the two-phase output is exactly the single-window
    output with per-task memory O(cap) — the 100 TB shape. (The
    exactness argument needs only a deterministic row-wise total
    order, so it holds for the weighted order too.)

    ``weight``: rank by the Efraimidis–Spirakis key ``-ln(u)/w``
    instead of the plain hash — per-domain WEIGHTED quotas (inclusion
    within each domain proportional to weight). Non-positive weights
    are excluded.
    """
    if weight is not None:
        wcol = F.col(weight) if isinstance(weight, str) else weight
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        u = (h.cast("double") + F.lit(1.0)) / F.lit(float((1 << 60) + 1))
        df = df.filter(wcol > 0)
        order = [(-F.log(u) / wcol.cast("double")), F.col(id_col)]
    else:
        order = _cap_order(id_col, salt)
    w = Window.partitionBy(domain).orderBy(*order)
    if shards is not None and shards <= 1:
        shards = None  # one shard IS the plain plan
    if shards is None:
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )
    shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(shards))
    w1 = Window.partitionBy(F.col(domain), shard).orderBy(*order)
    pre = (
        df.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= cap)
        .drop("__rn1")
    )
    return (
        pre.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column | str,
    k: int = 100,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row gets key ``-ln(u) / w`` with u uniform in (0,1),
    and the k smallest keys are the sample — inclusion probability
    proportional to weight, exactly the quality-weighted data
    selection a training pipeline needs.

    The uniform is DERIVED, not drawn: u = (salted 60-bit md5 of the
    id + 1) / (2^60 + 1) ∈ (0, 1) — so the sample is a pure function
    of (ids, weights, salt): reproducible across engines, re-runs,
    and partitioning, and the whole operator is one scan + TakeOrdered
    (no shuffle, no state). Rows with non-positive weight are
    excluded (their key would be infinite or reversed).

    Adds ``__key`` for auditability; deterministic (key, id) total
    order breaks exact ties."""
    w = F.col(weight) if isinstance(weight, str) else weight
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float((1 << 60) + 1))
    key = -F.log(u) / w.cast("double")
    return (
        df.filter(w > 0)
        .withColumn("__key", key)
        .orderBy("__key", id_col)
        .limit(k)
    )
