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

from pyspark.sql import Column, DataFrame
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
