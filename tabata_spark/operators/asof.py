"""As-of join and time-grid resampling (north-star extension — the
brief's canonical "operator Spark lacks", built as a composition of
existing DataFrame ops).

Both operators use the same scalable formulation: UNION the two sides
tagged by origin, one window partitioned by the join key and ordered
by (ts, side), and ``last(..., ignorenulls=True)`` to carry the most
recent right-side values forward. Cost is ONE shuffle on the key —
there is no join at all, so no row explosion, no range-join quadratic
risk, and skew behaves exactly like any window partition. This is the
standard large-scale as-of pattern (a sort-merge as-of needs engine
support; the union-window form gets the same result from primitives
Catalyst already optimizes).

DuckDB has a native ``ASOF JOIN``, which the battery uses as the
oracle — the two implementations are completely independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tabata_spark.operators.timeutil import epoch_diff_s, epoch_s


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    matched_ts_name: str = "matched_ts",
    strict: bool = False,
    tolerance_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, the right row with the greatest
    ``ts`` ≤ left.ts (``direction="backward"``, the default) or the
    smallest ``ts`` ≥ left.ts (``direction="forward"`` — "next
    scheduled maintenance/price change after this point") within the
    same ``key_cols`` group; ``strict`` excludes the equal-ts match.
    Unmatched rows keep nulls.

    ``value_cols`` are the right columns to carry (defaults to all
    non-key, non-ts columns). ``tolerance_s`` nulls matches farther
    than the given number of seconds in the match direction. Right
    (key, ts) pairs must be unique for a deterministic result
    (pre-aggregate the right side). Both directions are the same
    union-window formulation — one shuffle, no join operator; forward
    simply flips the frame (current→following) and the carry function
    (first instead of last).
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*key_cols, ts_col)
        ]
    carried = [matched_ts_name, *[f"__r_{c}" for c in value_cols]]
    rsel = right.select(
        *key_cols,
        F.col(ts_col).alias("__ts"),
        F.col(ts_col).alias(matched_ts_name),
        *[F.col(f"`{c}`").alias(f"__r_{c}") for c in value_cols],
        F.lit(0).alias("__is_left"),
    )
    lsel = left.withColumn("__ts", F.col(ts_col)).withColumn(
        "__is_left", F.lit(1)
    )
    u = lsel.unionByName(rsel, allowMissingColumns=True)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # tie order at equal ts: non-strict wants the right row VISIBLE to
    # the left row within the frame (backward frame looks back, so
    # right sorts first; forward frame looks ahead, so right sorts
    # last); strict hides it (the opposite placement)
    if direction == "backward":
        order = [F.col("__ts")] + (
            [F.desc("__is_left")] if strict else [F.col("__is_left")]
        )
        frame = (Window.unboundedPreceding, Window.currentRow)
        carry = F.last
    else:
        order = [F.col("__ts")] + (
            [F.col("__is_left")] if strict else [F.desc("__is_left")]
        )
        frame = (Window.currentRow, Window.unboundedFollowing)
        carry = F.first
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(*frame)
    )
    out = u.select(
        "*", *[carry(c, ignorenulls=True).over(w).alias(f"__m_{c}") for c in carried]
    ).filter(F.col("__is_left") == 1)
    if tolerance_s is not None:
        if direction == "backward":
            stale = epoch_diff_s("__ts", f"__m_{matched_ts_name}") > float(tolerance_s)
        else:
            stale = epoch_diff_s(f"__m_{matched_ts_name}", "__ts") > float(tolerance_s)
        for c in carried:
            out = out.withColumn(
                f"__m_{c}", F.when(~stale, F.col(f"__m_{c}"))
            )
    keep = [c for c in left.columns]
    renames = [F.col(f"__m_{matched_ts_name}").alias(matched_ts_name)] + [
        F.col(f"__m___r_{c}").alias(c) for c in value_cols
    ]
    return out.select(*keep, *renames)


def m4_downsample(
    df: DataFrame,
    n_buckets: int = 100,
    key_col: str = "record_id",
    seq_col: str = "seq",
    value_col: str = "value",
) -> DataFrame:
    """M4 time-series downsampling: per (key, time-bucket), keep the
    first, last, min and max points — the standard error-free
    reduction for line-chart rendering (a pixel column can only show
    those four), and unlike LTTB it is one aggregation with NO
    sequential dependency, so it parallelizes like any groupBy.

    Buckets split the key's [min(seq), max(seq)] span evenly; output
    is (key, bucket, seq-ordered first/last and value min/max with
    their seqs). One record-window pass for the span + one partial-agg
    shuffle."""
    w = Window.partitionBy(key_col)
    lo = F.min(seq_col).over(w)
    hi = F.max(seq_col).over(w)
    span = F.greatest(hi - lo, F.lit(1))
    bucket = F.least(
        F.floor((F.col(seq_col) - lo) * n_buckets / span),
        F.lit(n_buckets - 1),
    ).cast("int")
    v = F.col(value_col)
    s = F.col(seq_col)
    return (
        df.withColumn("__b", bucket)
        .groupBy(key_col, F.col("__b").alias("bucket"))
        .agg(
            F.min_by(v, s).alias("v_first"),
            F.max_by(v, s).alias("v_last"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.min(s).alias("seq_first"),
            F.max(s).alias("seq_last"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def lttb_downsample(
    df: DataFrame,
    n_buckets: int = 100,
    key_col: str = "record_id",
    seq_col: str = "seq",
    value_col: str = "value",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling, fixed-anchor
    variant (the parallelizable form: each bucket's point maximizes
    the triangle against the NEIGHBOR BUCKETS' average points, not the
    previously-selected point — classic LTTB's left anchor makes it
    inherently sequential per series; anchoring on precomputed bucket
    averages is the standard distributed/streaming adaptation, e.g.
    the anchor strategy of the MinMaxLTTB line of work, and is
    visually indistinguishable on real series). First and last buckets
    keep the series' first/last point, as in classic LTTB.

    Scale shape: one record-window pass for the span (shared with
    m4_downsample), one partial-agg shuffle for the per-bucket
    averages (n_buckets rows per key — tiny), lag/lead over that tiny
    table, a co-partitioned join back to the points, and one
    row_number window per (key, bucket). No sequential dependency, no
    driver loop — scales like any aggregation.

    Engine determinism: bucket averages use exact DECIMAL sums over
    integer counts (partial-agg order can't perturb them), the
    triangle area is a fixed-order double expression rounded to 6
    decimals, and ties break on smallest seq — the DuckDB oracle
    replays bit-identical selections.

    Returns (key, bucket, seq, value) — the selected point per
    non-empty bucket."""
    w = Window.partitionBy(key_col)
    lo = F.min(seq_col).over(w)
    hi = F.max(seq_col).over(w)
    span = F.greatest(hi - lo, F.lit(1))
    bucket = F.least(
        F.floor((F.col(seq_col) - lo) * n_buckets / span),
        F.lit(n_buckets - 1),
    ).cast("int")
    pts = df.select(key_col, seq_col, value_col).withColumn("__b", bucket)
    avgs = pts.groupBy(key_col, "__b").agg(
        (
            F.sum(F.col(seq_col).cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("__ax"),
        (
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("__ay"),
    )
    wb = Window.partitionBy(key_col).orderBy("__b")
    anch = avgs.select(
        key_col,
        "__b",
        F.lag("__ax").over(wb).alias("__lx"),
        F.lag("__ay").over(wb).alias("__ly"),
        F.lead("__ax").over(wb).alias("__rx"),
        F.lead("__ay").over(wb).alias("__ry"),
    )
    x = F.col(seq_col).cast("double")
    y = F.col(value_col).cast("double")
    area = F.abs(
        (F.col("__lx") - F.col("__rx")) * (y - F.col("__ly"))
        - (F.col("__lx") - x) * (F.col("__ry") - F.col("__ly"))
    ) / F.lit(2.0)
    # one ordering expression for all three bucket roles: first bucket
    # -> earliest point, last bucket -> latest point, interior ->
    # largest (rounded) triangle; comparisons never cross buckets
    score = (
        F.when(F.col("__b") == 0, -x)
        .when(F.col("__b") == n_buckets - 1, x)
        .otherwise(F.round(area, 6))
    )
    ws = Window.partitionBy(key_col, "__b").orderBy(
        F.desc("__score"), F.asc(seq_col)
    )
    return (
        pts.join(anch, [key_col, "__b"])
        .withColumn("__score", score)
        .withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") == 1)
        .select(key_col, F.col("__b").alias("bucket"), seq_col, value_col)
    )


def resample_linear(
    df: DataFrame,
    key_col: str = "record_id",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    step_s: float = 1.0,
) -> DataFrame:
    """Per-key resampling onto a regular time grid with linear
    interpolation between surrounding samples (constant extrapolation
    at the edges).

    Grid rows are generated per key from min/max ts (a sequence
    explode — no driver loop), unioned with the samples, and one
    ordered window carries the previous/next known (ts, value) pairs;
    the interpolation is a plain column expression. One shuffle."""
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in (key_col, ts_col)]
    bounds = df.groupBy(key_col).agg(
        F.min(epoch_s(ts_col)).alias("__t0"),
        F.max(epoch_s(ts_col)).alias("__t1"),
    )
    n_steps = F.floor((F.col("__t1") - F.col("__t0")) / F.lit(step_s)).cast("int")
    grid = bounds.select(
        key_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_steps),
                lambda i: F.col("__t0") + i.cast("double") * F.lit(step_s),
            )
        ).alias("__ts"),
    ).withColumn("__is_grid", F.lit(1))
    samples = df.select(
        key_col,
        epoch_s(ts_col).alias("__ts"),
        *[F.col(f"`{c}`").cast("double").alias(f"__v_{c}") for c in value_cols],
    ).withColumn("__is_grid", F.lit(0))
    u = grid.unionByName(samples, allowMissingColumns=True)

    # samples sort before grid points at equal ts, so a grid point
    # sitting exactly on a sample takes that sample's value
    wb = (
        Window.partitionBy(key_col)
        .orderBy("__ts", "__is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("__ts", F.desc("__is_grid"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    cols = [F.col(key_col), F.col("__ts").alias("grid_ts_s"), F.col("__is_grid")]
    prev_ts = F.last(F.when(F.col("__is_grid") == 0, F.col("__ts")), True).over(wb)
    next_ts = F.first(F.when(F.col("__is_grid") == 0, F.col("__ts")), True).over(wf)
    for c in value_cols:
        pv = F.last(F.when(F.col("__is_grid") == 0, F.col(f"__v_{c}")), True).over(wb)
        nv = F.first(F.when(F.col("__is_grid") == 0, F.col(f"__v_{c}")), True).over(wf)
        frac = F.when(
            next_ts > prev_ts, (F.col("__ts") - prev_ts) / (next_ts - prev_ts)
        ).otherwise(F.lit(0.0))
        interp = F.when(pv.isNull(), nv).when(nv.isNull(), pv).otherwise(
            pv + frac * (nv - pv)
        )
        cols.append(interp.alias(c))
    # windows must run over the UNFILTERED union (they read the sample
    # rows); only then keep the grid rows
    return (
        u.select(*cols).filter(F.col("__is_grid") == 1).drop("__is_grid")
    )


def fill_forward(
    df: DataFrame,
    cols: list[str],
    key: str = "record_id",
    order: str = "seq",
    back: bool = False,
) -> DataFrame:
    """LOCF gap filling: replace nulls in ``cols`` with the most recent
    non-null value within the record (``back=True`` additionally
    backfills any leading nulls from the first following non-null —
    pandas ffill().bfill()). One record-partitioned window per
    direction, sharing the signal pipeline's partitioning; linear
    interpolation lives in :func:`resample_linear`."""
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if back:
        wb = (
            Window.partitionBy(key)
            .orderBy(order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        for c in cols:
            out = out.withColumn(c, F.first(c, ignorenulls=True).over(wb))
    return out
