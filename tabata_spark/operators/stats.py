"""Distributed resampling statistics (net-new surface): Poisson
bootstrap over a corpus metric — uncertainty quantification for the
numbers a data pipeline reports (mean quality score, mean doc length,
dedup rate) without collecting the data or a second pass per
replicate.

The Poisson bootstrap (each row enters replicate b with weight
W ~ Poisson(1)) is the distributed form of the classic bootstrap: all
B replicates accumulate in ONE scan as 2·B map-side-combinable sums —
no resampled copies of the data exist anywhere. The randomness is
DERIVED, not drawn: replicate b's weight for a row is the Poisson
inverse-CDF of a uniform built from a salted md5 of (replicate, id) —
two 60-bit uniforms per hash, so B replicates cost B/2 hashes per
row. Results are a pure function of (ids, values, salt): bit-stable
across engines, partitionings, and re-runs; value sums are quantized
to DECIMAL so the per-replicate sums are order-independent.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: cumulative Poisson(1) probabilities P(W <= k), k = 0..7; the tail
#: beyond 8 (< 1.1e-6) truncates to 8 — identical in every engine by
#: construction since the same literals gate the same uniforms
POISSON1_CDF: tuple[float, ...] = tuple(
    sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1)) for k in range(8)
)

_DENOM = float((1 << 60) + 1)


def _uniform_sql(salt: str, b: int, id_col: str, hasher: str = "md5") -> str:
    """SQL for the b-th derived uniform of a row, scaled into (0, 1).

    ``md5``: hex half ``b % 2`` of md5('<salt>:<b//2>:<id>') — the
    engine-portable construction the DuckDB oracle replays.
    ``xxhash64``: one JVM hash per replicate (production fast path —
    same prod/parity split as dedup.simhash and sketch._cms_bucket)."""
    if hasher == "xxhash64":
        return (
            f"(pmod(xxhash64('{salt}', {b}, cast({id_col} as string)), "
            f"1152921504606846976L) + 1.0) / {_DENOM!r}"
        )
    start = 1 if b % 2 == 0 else 17
    return (
        f"(conv(substring(md5(concat_ws(':', '{salt}', '{b // 2}', "
        f"cast({id_col} as string))), {start}, 15), 16, 10) + 1.0) / {_DENOM!r}"
    )


def _poisson_sql(u_ref: str) -> str:
    """Searched CASE mapping a (pre-projected) uniform to Poisson(1)
    via the truncated inverse CDF."""
    arms = " ".join(
        f"WHEN {u_ref} < {c!r} THEN {k}" for k, c in enumerate(POISSON1_CDF)
    )
    return f"CASE {arms} ELSE 8 END"


def bootstrap_means(
    df: DataFrame,
    value: str = "value",
    id_col: str = "event_id",
    n_replicates: int = 50,
    salt: str = "boot",
    decimals: int = 6,
    group_by: list[str] | None = None,
    hasher: str = "md5",
) -> DataFrame:
    """B Poisson-bootstrap replicate means of ``value`` in one scan:
    returns (b, mean_b) with ``mean_b = round(Σ w·x / Σ w, decimals)``
    — x quantized to DECIMAL(18, decimals) before weighting so the
    sums are exact and order-independent. Percentiles of the returned
    frame are the bootstrap CI. ``group_by`` computes per-stratum
    replicates instead (one extra grouping key on the same single
    scan — stratified uncertainty for per-domain/per-type metrics)."""
    xs = f"cast({value} as decimal(18,{decimals}))"
    # project each uniform/weight ONCE per row (a weight inlined into
    # the CASE would re-evaluate its md5 per comparison arm), then
    # accumulate 2B map-side-combinable sums.
    #
    # Plan-construction hygiene (r16, opt guide §7.3 "avoid generating
    # gigantic expression trees in loops"): the former per-replicate
    # ``withColumn`` chain re-analyzed a growing projection 2B times —
    # O(B²) driver work that dominated the whole query (measured at
    # B=50, sf0.1: 3.4 s plan build vs 0.33 s execution). Two
    # ``selectExpr`` projections (uniforms, then weights) and
    # SQL-string aggregates build the IDENTICAL analyzed plan in O(B)
    # with three py4j calls total.
    proj = df.selectExpr(
        "*",
        *[
            f"({_uniform_sql(salt, b, id_col, hasher)}) AS __u{b}"
            for b in range(n_replicates)
        ],
    ).selectExpr(
        "*",
        *[f"({_poisson_sql(f'__u{b}')}) AS __w{b}" for b in range(n_replicates)],
    )
    aggs = []
    for b in range(n_replicates):
        aggs.append(
            F.expr(
                f"cast(sum(__w{b} * {xs}) as decimal(28,{decimals})) "
                f"as __sx{b}"
            )
        )
        aggs.append(F.expr(f"cast(sum(__w{b}) as bigint) as __sw{b}"))
    row = proj.groupBy(*group_by).agg(*aggs) if group_by else proj.agg(*aggs)
    reps_sql = "array(" + ", ".join(
        f"struct(cast({b} as bigint) as b, "
        f"round(cast(__sx{b} as double) / cast(__sw{b} as double), "
        f"{decimals}) as mean_b)"
        for b in range(n_replicates)
    ) + ")"
    keys = list(group_by or [])
    return (
        row.select(*keys, F.explode(F.expr(reps_sql)).alias("r"))
        .select(*keys, "r.b", "r.mean_b")
        .orderBy(*keys, "b")
    )


def geometric_cdf(p: float) -> tuple[float, ...]:
    """CDF of Geometric(1-p) on {0, 1, ...}: cdf[k] = 1 - p^(k+1),
    truncated where the tail mass p^(k+1) drops below 1e-15 (for
    p = e^-1 that is 35 arms). Like POISSON1_CDF, these literals gate
    the same uniforms in every engine, so the sampled value is
    bit-identical by construction — no libm ``ln`` at query time.

    The table is capped at 202 arms; a ``p`` whose 1e-15 tail is not
    reached by then (for the DP release: epsilon below ~0.172, noise
    scale ≳ 6) raises ValueError rather than silently clipping the
    distribution — a clipped geometric would weaken the stated ε-DP
    guarantee while still replaying consistently on both engines."""
    cdf: list[float] = []
    k = 0
    while True:
        tail = p ** (k + 1)
        cdf.append(1.0 - tail)
        if tail < 1e-15:
            return tuple(cdf)
        if k > 200:
            raise ValueError(
                f"geometric_cdf(p={p!r}): tail mass {tail:.3e} has not "
                "reached 1e-15 within 202 arms — the truncated inverse "
                "CDF cannot honor this noise scale (for "
                "dp_release_counts this means epsilon < ~0.172; use a "
                "larger epsilon)"
            )
        k += 1


def _geometric_sql(u_ref: str, p: float) -> str:
    """Searched CASE mapping a (pre-projected) uniform to
    Geometric(1-p) on {0, 1, ...} via the truncated inverse CDF."""
    cdf = geometric_cdf(p)
    arms = " ".join(
        f"WHEN {u_ref} < {c!r} THEN {k}" for k, c in enumerate(cdf)
    )
    return f"CASE {arms} ELSE {len(cdf)} END"


def dp_release_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    threshold: int = 5,
    salt: str = "dp",
    hasher: str = "md5",
) -> DataFrame:
    """ε-differentially-private release of per-group document counts
    — the mechanism a pipeline uses to publish corpus statistics
    (dataset cards, mixture reports) without exposing the presence of
    any single document.

    Per group: ``noisy_count = count + (G1 - G2)`` where each
    G ~ Geometric(1 - e^-ε) — the difference is the two-sided
    geometric (discrete Laplace), the exact discrete analogue of the
    Laplace mechanism for sensitivity-1 counts (add/remove one row
    changes exactly one disjoint group's count by 1), so the released
    counts are ε-DP. Groups whose noisy count falls below
    ``threshold`` are suppressed, mitigating the existence leak of
    publishing the group-key set itself.

    One scan + one aggregation; the noise is a pure function of
    (group key, salt) via the same salted-md5 uniforms as
    :func:`bootstrap_means` (``hasher="xxhash64"`` for the JVM fast
    path), so releases are reproducible and the oracle replays them
    exactly. The noise key is a SELF-DELIMITING encoding of the group
    tuple — per value ``v<len>:<value>``, NULL → ``n:`` — so distinct
    tuples can never collide into shared noise (a plain ':'-join
    would conflate ('a:b','c') with ('a','b:c')) and NULL group
    values get deterministic noise instead of being silently skipped.
    Supported epsilon floor ~0.172 (see :func:`geometric_cdf`; below
    it the truncated CDF would clip the noise and ValueError is
    raised). PRODUCTION NOTE: deterministic noise means re-releasing
    under the same salt spends no new privacy budget but re-releasing
    under a NEW salt does — rotate salts only when accounting for the
    additional ε (:func:`dp_budget`).

    MIGRATION NOTE (noise-breaking, round 15): the self-delimiting
    key encoding above replaced a plain ``':'``-join — a correctness
    fix (injectivity + NULL handling), but it changes the uniform
    drawn for every pre-existing (salt, group-key) pair, so outputs
    published under the old encoding will NOT reproduce, and a
    re-release of an old table under its old salt draws FRESH
    correlated noise: per :func:`dp_budget` semantics that is an
    additional ε spend, not a free replay. Account any post-migration
    re-release under a pre-migration salt as a new release (give it
    a distinct ``release_id``), or rotate to a new salt explicitly
    so the break is visible in the ledger."""
    p = math.exp(-epsilon)
    parts = []
    for c in group_cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("n:")).otherwise(
                F.concat(
                    F.lit("v"), F.length(s).cast("string"), F.lit(":"), s
                )
            )
        )
    key = F.concat(*parts).alias("__k")
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    proj = counts.withColumn("__k", key).select(
        *group_cols,
        "__n",
        F.expr(_uniform_sql(salt, 0, "__k", hasher)).alias("__u0"),
        F.expr(_uniform_sql(salt, 1, "__k", hasher)).alias("__u1"),
    )
    noisy = (
        F.col("__n")
        + F.expr(_geometric_sql("__u0", p)).cast("long")
        - F.expr(_geometric_sql("__u1", p)).cast("long")
    ).alias("noisy_count")
    return (
        proj.select(*group_cols, noisy)
        .filter(F.col("noisy_count") >= threshold)
        .orderBy(*group_cols)
    )


def dp_budget(releases: list[tuple]) -> float:
    """Total ε spent by a sequence of :func:`dp_release_counts`
    releases, as ``(salt, epsilon)`` or ``(salt, epsilon,
    release_id)`` tuples — the accounting the PRODUCTION NOTE on that
    function states, made checkable.

    Because the noise is a pure function of (group key, salt),
    re-releasing the SAME release (same table, same grouping) under
    the SAME (salt, epsilon) is a bit-identical replay and spends
    nothing new; each DISTINCT salt draws fresh noise and composes
    sequentially (budgets add). The same salt at a DIFFERENT epsilon
    maps the same underlying uniforms through a different inverse
    CDF — correlated with, but not identical to, the earlier
    release — and is charged conservatively as a fresh release.

    ``release_id`` is the identity of WHAT was released (table +
    group spec, e.g. ``"documents:source,lang"``): two DIFFERENT
    releases under the same (salt, epsilon) — easy to produce, since
    both ``salt='dp'`` and ``epsilon=1.0`` are defaults — are NOT
    replays of each other and must each be charged, so the dedup key
    is the full (salt, epsilon, release_id) tuple. The 2-tuple form
    remains accepted for the caller who guarantees one salt is never
    reused across distinct releases (it normalizes to
    ``release_id=""``); when a salt IS shared across releases, omit
    the id and this function would UNDER-report — pass the id.
    Hence: total = sum of epsilon over distinct
    (salt, epsilon, release_id) tuples."""
    seen = {
        (r[0], float(r[1]), r[2] if len(r) > 2 else "") for r in releases
    }
    return float(sum(e for _, e, _ in seen))


def chi_squared_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Pearson chi-squared test of independence over the (row_col,
    col_col) contingency table — the categorical drift check ("did the
    source × language composition shift?"). Returns one row
    (n, n_rows, n_cols, dof, chi2).

    The statistic sums (O-E)^2/E over the FULL r x c grid — zero-count
    cells contribute their expected count E (the classic drift
    signature, a category present in only one group, lives exactly in
    those cells; summing observed cells only would underestimate chi2
    while dof still assumed the full grid). The grid is materialized by
    cross-joining the two marginal tables (tiny — category counts, not
    data) and left-joining observed cells with O coalesced to 0; this
    matches scipy.stats.chi2_contingency.

    Engine-portable determinism: observed counts and marginals are
    exact integers; each cell's (O-E)^2/E term is a fixed-order double
    expression from those integers, quantized to DECIMAL before the
    cell sum (order-independent), encoded as DOUBLE at the boundary.
    Plan shape: one count aggregation over cells + two tiny marginal
    aggregations broadcast back — a contingency table is never large.
    """
    cells = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("__o"))
    rt = cells.groupBy(row_col).agg(F.sum("__o").alias("__rt"))
    ct = cells.groupBy(col_col).agg(F.sum("__o").alias("__ct"))
    tot = cells.agg(
        F.sum("__o").alias("__n"),
        F.countDistinct(row_col).alias("__nr"),
        F.countDistinct(col_col).alias("__nc"),
    )
    grid = F.broadcast(rt).crossJoin(F.broadcast(ct))
    full = grid.join(
        F.broadcast(cells), [row_col, col_col], "left"
    ).withColumn("__o", F.coalesce(F.col("__o"), F.lit(0)))
    e = F.col("__rt").cast("double") * F.col("__ct") / F.col("__n")
    term = F.pow(F.col("__o") - e, F.lit(2.0)) / e
    dec = f"decimal(28,{decimals})"
    return (
        full.join(F.broadcast(tot))
        .agg(
            F.first("__n").alias("n"),
            F.first("__nr").cast("long").alias("n_rows"),
            F.first("__nc").cast("long").alias("n_cols"),
            ((F.first("__nr") - 1) * (F.first("__nc") - 1))
            .cast("long")
            .alias("dof"),
            F.sum(F.round(term, decimals).cast(dec))
            .cast(dec)
            .cast("double")
            .alias("chi2"),
        )
    )


def psi_drift(
    df: DataFrame,
    bucket_col,
    group_col: str,
    groups: tuple[str, str],
    decimals: int = 6,
) -> DataFrame:
    """Population Stability Index between two groups' distributions
    over a pre-binned column — the industry-standard "has this feature
    drifted" score (rule of thumb: <0.1 stable, >0.25 action).

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i) with add-0.5 smoothing
    over the UNION of observed buckets (both engines see the same
    bucket set, so smoothing is symmetric). Pass an integer-valued
    bucket expression (e.g. ``F.col("n_chars") / 100`` floored) —
    quantile binning is engine-divergent, fixed-width integer bins are
    not. Per-bucket terms are DECIMAL-quantized before the sum;
    output encodes as DOUBLE. One aggregation over buckets.
    """
    a, b = groups
    bc = bucket_col if not isinstance(bucket_col, str) else F.col(bucket_col)
    pool = (
        df.filter(F.col(group_col).isin(a, b))
        .groupBy(bc.alias("__bkt"))
        .agg(
            F.sum(F.when(F.col(group_col) == a, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(F.col(group_col) == b, 1).otherwise(0)).alias("__cb"),
        )
    )
    tot = pool.agg(
        F.sum("__ca").alias("__na"),
        F.sum("__cb").alias("__nb"),
        F.count(F.lit(1)).alias("__k"),
    )
    p = (F.col("__ca") + 0.5) / (F.col("__na") + 0.5 * F.col("__k"))
    q = (F.col("__cb") + 0.5) / (F.col("__nb") + 0.5 * F.col("__k"))
    term = (p - q) * F.log(p / q)
    dec = f"decimal(28,{decimals})"
    return pool.join(F.broadcast(tot)).agg(
        F.first("__na").cast("long").alias("n_a"),
        F.first("__nb").cast("long").alias("n_b"),
        F.first("__k").cast("long").alias("n_buckets"),
        F.sum(F.round(term, decimals).cast(dec))
        .cast(dec)
        .cast("double")
        .alias("psi"),
    )


def conformal_qhat(
    cal: DataFrame,
    score_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
    group_cols: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Split-conformal calibration quantile (Vovk et al.; the modern
    distribution-free interval recipe): q_hat is the k-th smallest
    calibration score with k = ceil((n+1)(1-alpha)) — predictions
    +/- q_hat then cover with probability >= 1-alpha under
    exchangeability, NO model or distribution assumptions. The
    miscoverage level is the exact rational alpha_num/alpha_den and k
    is computed in integer arithmetic (((n+1)(den-num) + den-1) DIV
    den, clamped to n): a double (n+1)*(1-alpha) would flip the ceil
    on representation error at exactly the boundary ranks that matter.

    One rank window per group over the calibration scores — O(cal)
    work, any group count. Returns (group_cols..., n_cal, q_hat)."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    order = [F.col(score_col).asc()]
    if order_col:
        order.append(F.col(order_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    wn = (
        Window.partitionBy(*group_cols)
        if group_cols
        else Window.partitionBy(F.lit(1))
    )
    keep = alpha_den - alpha_num
    ranked = cal.select(
        *group_cols,
        F.col(score_col).alias("__s"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    # integer ceil division (values far below 2^52, so the double
    # floor is exact): k = ceil((n+1)*keep / den), clamped to n
    k = F.least(
        F.col("__n"),
        F.floor(
            ((F.col("__n") + 1) * keep + alpha_den - 1) / F.lit(alpha_den)
        ).cast("long"),
    )
    return (
        ranked.filter(F.col("__rn") == k)
        .select(
            *group_cols,
            F.col("__n").cast("long").alias("n_cal"),
            F.col("__s").alias("q_hat"),
        )
    )


def mutual_information(
    df: DataFrame,
    row_col,
    col_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Mutual information I(X;Y) = sum p_xy * ln(p_xy / (p_x * p_y))
    over the joint distribution of two categorical columns (pass a
    pre-binned expression for a numeric X) — the feature-relevance
    screen ("how much does this bucketed feature tell us about the
    label") that chi-squared's unnormalized statistic cannot rank
    across features. Zero cells contribute 0 (the 0*ln0 limit), so
    unlike chi2 no grid completion is needed; the p's are exact
    integer count ratios and each term is a fixed-order double
    quantized to DECIMAL before the (order-independent) sum. One
    count aggregation + two broadcast marginals. Returns one row
    (n, mi_nats)."""
    rc = row_col if not isinstance(row_col, str) else F.col(row_col)
    cells = (
        df.select(rc.alias("__x"), F.col(col_col).alias("__y"))
        .groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    rt = cells.groupBy("__x").agg(F.sum("__o").alias("__rx"))
    ct = cells.groupBy("__y").agg(F.sum("__o").alias("__cy"))
    tot = cells.agg(F.sum("__o").alias("__n"))
    pxy = F.col("__o").cast("double") / F.col("__n")
    ratio = (
        F.col("__o").cast("double") * F.col("__n")
        / (F.col("__rx").cast("double") * F.col("__cy"))
    )
    term = pxy * F.log(ratio)
    dec = f"decimal(28,{decimals})"
    return (
        cells.join(F.broadcast(rt), "__x")
        .join(F.broadcast(ct), "__y")
        .join(F.broadcast(tot))
        .agg(
            F.first("__n").cast("long").alias("n"),
            F.sum(F.round(term, decimals).cast(dec))
            .cast(dec)
            .cast("double")
            .alias("mi_nats"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    n_grid: int = 100,
    decimals: int = 6,
) -> DataFrame:
    """Quantile normalization (Bolstad et al. 2003, the microarray /
    batch-effect-correction standard): every group's value
    distribution is mapped onto the SAME reference distribution — the
    mean of the per-group quantile grids — so downstream consumers see
    comparable feature scales across sources ("source A scores run
    hot" stops mattering). A row keeps its within-group RANK and takes
    the reference value at that rank's grid cell.

    Scale shape: within-group windows only (partitioned, parallel —
    no global sort anywhere); the grids are n_grid rows per group,
    their mean is a tiny aggregation broadcast back. Grid cell
    j = ceil(rank * n_grid / N) in integer arithmetic; cell value is
    the group's max value in the cell (quantile-disc convention);
    reference is the exact-DECIMAL mean over the groups present in
    that cell — every step engine-replayable. Returns
    (group_col, id_col, value_col, q_value)."""
    from pyspark.sql import Window

    wg = Window.partitionBy(group_col).orderBy(value_col, id_col)
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        group_col,
        id_col,
        value_col,
        F.row_number().over(wg).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__N"),
    ).withColumn(
        "__j",
        F.floor(
            (F.col("__rn") * n_grid + F.col("__N") - 1) / F.col("__N")
        ).cast("long"),
    )
    grid = ranked.groupBy(group_col, "__j").agg(
        F.max(value_col).alias("__gv")
    )
    ref = grid.groupBy("__j").agg(
        F.round(
            F.sum(F.col("__gv").cast(f"decimal(18,{decimals})"))
            .cast("double")
            / F.count(F.lit(1)),
            decimals,
        ).alias("q_value")
    )
    return ranked.join(F.broadcast(ref), "__j").select(
        group_col, id_col, value_col, "q_value"
    )


def theilsen_slope(
    signals: DataFrame,
    n_pairs: int = 64,
    salt: str = "tsen",
    key_col: str = "record_id",
    seq_col: str = "seq",
    value_col: str = "value",
    decimals: int = 6,
) -> DataFrame:
    """Sampled Theil-Sen trend slope per series: the median of
    pairwise slopes over ``n_pairs`` HASH-DERIVED point pairs — the
    robust alternative to the OLS slope (a_record_trend): a handful
    of outliers moves OLS arbitrarily but shifts a slope median by at
    most its rank weight (~29% breakdown for full Theil-Sen; the
    sampled estimator inherits it at m pairs). Full Theil-Sen is
    O(N^2) pairs per series — hash-sampling m pairs keeps it O(m) per
    series at any length, and deriving the pairs from salted md5 of
    (j, key) makes the estimate a pure function of the data, bit-equal
    under any partitioning and replayable by the SQL oracle (the
    engine's derived-randomness discipline, operators/sampling.py).

    Pair j of a length-N series: i1 = H('a', j, key) % N and
    i2 = (i1 + 1 + H('b', j, key) % (N-1)) % N — distinct by
    construction. Requires the series' ``seq_col`` to be the dense
    0..N-1 position (the signal-set layout). Returns
    (key_col, n, ts_slope)."""

    def _h(tag: str) -> "F.Column":
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt + tag),
                        F.col("__j").cast("string"),
                        F.col(key_col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    counts = signals.groupBy(key_col).agg(F.count(F.lit(1)).alias("__N"))
    pairs = (
        counts.filter(F.col("__N") >= 2)
        .select(
            key_col,
            "__N",
            F.explode(F.sequence(F.lit(0), F.lit(n_pairs - 1))).alias("__j"),
        )
        .select(
            key_col,
            "__N",
            "__j",
            (_h("a") % F.col("__N")).alias("__i1"),
        )
        .withColumn(
            "__i2",
            (F.col("__i1") + 1 + _h("b") % (F.col("__N") - 1)) % F.col("__N"),
        )
    )
    s1 = signals.select(
        F.col(key_col).alias("__k1"),
        F.col(seq_col).alias("__p1"),
        F.col(value_col).alias("__v1"),
    )
    s2 = signals.select(
        F.col(key_col).alias("__k2"),
        F.col(seq_col).alias("__p2"),
        F.col(value_col).alias("__v2"),
    )
    joined = (
        pairs.join(
            s1,
            (pairs[key_col] == s1["__k1"]) & (pairs["__i1"] == s1["__p1"]),
        )
        .join(
            s2,
            (pairs[key_col] == s2["__k2"]) & (pairs["__i2"] == s2["__p2"]),
        )
        .select(
            pairs[key_col].alias(key_col),
            "__N",
            (
                (F.col("__v2") - F.col("__v1"))
                / (F.col("__i2") - F.col("__i1")).cast("double")
            ).alias("__slope"),
        )
    )
    return joined.groupBy(key_col).agg(
        F.max("__N").cast("long").alias("n"),
        F.round(F.expr("percentile(__slope, 0.5)"), decimals).alias("ts_slope"),
    )
