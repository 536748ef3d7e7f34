"""Distributed exact rank / ntile — no single-partition global window.

``F.ntile(k).over(Window.orderBy(...))`` funnels the whole table
through ONE task (Spark plans an empty-partitioning window as a single
partition). Fine for an entity-level aggregate at test scale; a
cluster-killer on anything fact-sized. This module reconstructs the
EXACT same rank — and therefore the exact same ntile buckets — from
fully parallel pieces:

1. ``repartitionByRange`` on the (total-order) sort keys: every
   partition owns a contiguous key range, partitions are mutually
   ordered.
2. One tiny job counts rows per partition (one output row per
   partition — collected to the driver, O(partitions)).
3. Cumulative counts give each partition's global rank offset;
   ``row_number`` over a ``partitionBy(partition_id)`` window (runs
   parallel, one local sort per partition — and the range shuffle
   already clustered the keys) plus the broadcast offset is the exact
   global rank.
4. The ntile bucket is then pure arithmetic on (rank, n, k) — SQL
   NTILE semantics: n = q*k + r means the first r buckets get q+1
   rows, the rest q.

Because the sort keys must form a TOTAL order (callers tie-break on a
unique key, exactly as they must for deterministic ``ntile``), the
reconstructed rank is invariant to where the range boundaries land —
results are bit-identical to the single-partition window under any
partitioning, which the tests pin against ``F.ntile`` itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_exact_rank",
    "with_exact_ntile",
    "with_exact_cumsum",
    "ntile_from_rank",
    "exact_discrete_quantiles",
]


def with_exact_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "__rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Append the exact 1-based global rank by ``order_cols`` (which
    must be a total order — include a unique tie-break key) without a
    single-partition window. Returns ``(df_with_rank, n_rows)``; the
    returned frame is persisted (callers unpersist when done)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    # one row per partition — O(partitions) driver-side, not O(rows)
    counts = {
        r["__pid"]: r["__n"]
        for r in d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    n_rows, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = n_rows
        n_rows += counts[pid]
    off_expr: Column = F.lit(0)
    if offsets:
        pairs: list[Column] = []
        for pid, off in offsets.items():
            pairs.extend([F.lit(int(pid)), F.lit(int(off))])
        off_expr = F.element_at(F.create_map(*pairs), F.col("__pid"))
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = d.withColumn(
        rank_col, (F.row_number().over(w) + off_expr).cast("long")
    ).drop("__pid")
    return out, n_rows


def ntile_from_rank(rank_col: str, n_rows: int, k: int) -> Column:
    """SQL NTILE(k) bucket from an exact 1-based rank column over n
    rows: with n = q*k + r, the first r buckets hold q+1 rows each,
    the remaining k-r hold q. Pure INTEGER arithmetic (SQL ``div``) —
    exact at any scale, no double-division rounding edge."""
    q, r = divmod(int(n_rows), int(k))
    head = r * (q + 1)  # rows covered by the fat buckets
    qt = max(q, 1)  # thin-bucket width (q==0 only when n<k: all fat)
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {head} "
        f"THEN ({rank_col} + {q}) div {q + 1} "
        f"ELSE {r} + (({rank_col} - {head} + {qt - 1}) div {qt}) "
        f"END AS INT)"
    )


def with_exact_cumsum(
    df: DataFrame,
    order_cols: list,
    sum_cols: list[str],
    num_partitions: int | None = None,
    prefix: str = "cum_",
) -> DataFrame:
    """Append running totals of ``sum_cols`` by ``order_cols`` (a
    total order) — the distributed prefix sum: range-repartition, one
    tiny per-partition-totals job (O(partitions) rows to the driver),
    cumulative offsets folded back as a broadcast literal map, running
    sum WITHIN each partition. Bit-identical to
    ``F.sum(c).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    currentRow))`` for exact types (integers / DECIMAL), with no
    single-partition window. The returned frame is persisted."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    totals = (
        d.groupBy("__pid")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
        .collect()
    )
    totals.sort(key=lambda r: r["__pid"])
    offs: dict[str, list] = {c: [] for c in sum_cols}
    run = {c: 0 for c in sum_cols}
    for r in totals:
        for c in sum_cols:
            offs[c].append((int(r["__pid"]), run[c]))
            run[c] += r[c] or 0
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = d
    for c in sum_cols:
        off_expr: Column = F.lit(0)
        if offs[c]:
            pairs: list[Column] = []
            for pid, off in offs[c]:
                pairs.extend([F.lit(pid), F.lit(off)])
            off_expr = F.element_at(F.create_map(*pairs), F.col("__pid"))
        out = out.withColumn(prefix + c, F.sum(c).over(w) + off_expr)
    return out.drop("__pid")


def exact_discrete_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT order-statistic quantiles of a column, distributed: the
    value at rank ``ceil(q*n)`` for each q — the lower discrete
    quantile, deterministic under ties (the value at a rank in the
    sorted multiset is well-defined regardless of tie order). One
    range shuffle + one filter on O(len(qs)) exact ranks; no
    single-partition stage and no interpolation (interpolated
    percentiles' double arithmetic is engine-dependent at the ulp).
    Returns one row: ``n`` plus a ``q_<q>`` column per requested
    quantile. The approximate path at extreme scale is the DDSketch
    operator; this is the exact one for when the answer must be a
    real data value."""
    import math

    ranked, n = with_exact_rank(df, [col], "__rk", num_partitions)
    if n == 0:
        out = ranked.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("n"),
            *[
                F.lit(None).alias(f"q_{str(q).replace('.', '_')}")
                for q in qs
            ],
        )
        ranked.unpersist()
        return out
    ks = {q: max(1, math.ceil(q * n)) for q in qs}
    out = ranked.filter(F.col("__rk").isin(list(set(ks.values())))).agg(
        F.lit(n).cast("long").alias("n"),
        *[
            F.max(F.when(F.col("__rk") == F.lit(k), F.col(col))).alias(
                f"q_{str(q).replace('.', '_')}"
            )
            for q, k in ks.items()
        ],
    )
    return out


def with_exact_ntile(
    df: DataFrame,
    k: int,
    order_cols: list,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append NTILE(k) by ``order_cols`` (a total order), computed via
    the distributed exact rank — bit-identical to
    ``F.ntile(k).over(Window.orderBy(*order_cols))`` with no
    single-partition stage. The returned frame is persisted."""
    ranked, n = with_exact_rank(df, order_cols, "__rank", num_partitions)
    if n == 0:
        return ranked.withColumn(out_col, F.lit(None).cast("int")).drop("__rank")
    return ranked.withColumn(
        out_col, ntile_from_rank("__rank", n, k)
    ).drop("__rank")
