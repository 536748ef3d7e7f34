"""Slowly-changing-dimension (type 2) history: versioned dimension
rows with validity intervals, built Spark-first.

Two entry points:

- :func:`scd2_history` — from an append-only change log (full rows,
  one per observed state), build the type-2 dimension: consecutive
  no-op states collapse, each kept state gets (version, valid_from,
  valid_to, is_current). ONE window partitioning (by key) carries
  both the change-detection lag and the interval lead — a single
  shuffle regardless of corpus size, and the key partitioning is
  uniform (one customer's history is small).

- :func:`scd2_apply` — the production incremental shape: fold a new
  change batch into an existing dimension by rebuilding ONLY the
  touched keys (semi-join on the batch's keys; untouched rows pass
  through unshuffled). At 100 TB the batch is tiny relative to the
  dimension, so the rebuild cost is O(batch keys' history), not
  O(dimension).

Reference parity: the reference engine has no warehouse layer; this
extends the signal-store upsert (core/signalset.py put) with the
standard dimension-history contract every analytics stack needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key: str = "key",
    ts: str = "ts",
    tracked: list[str] | None = None,
) -> DataFrame:
    """Build the type-2 dimension from an append-only state log.

    ``changes`` holds one full row per observed state (key, ts,
    attributes). Ties on (key, ts) are broken deterministically by
    keeping the row ordering stable only if (key, ts) is unique —
    callers must not emit two states for one key at one ts.

    Returns (key, version, *tracked, valid_from, valid_to,
    is_current) with valid_to NULL on the open interval.
    """
    tracked = tracked or [c for c in changes.columns if c not in (key, ts)]
    w = Window.partitionBy(key).orderBy(ts)
    changed = F.row_number().over(w) == 1
    for c in tracked:
        # null-safe inequality: a state differs if ANY tracked column
        # is distinct from its predecessor
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    kept = changes.withColumn("__chg", changed).filter("__chg").drop("__chg")
    w2 = Window.partitionBy(key).orderBy(ts)
    return kept.select(
        key,
        F.row_number().over(w2).alias("version"),
        *tracked,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key: str = "key",
    ts: str = "ts",
    tracked: list[str] | None = None,
) -> DataFrame:
    """Fold a change batch into an existing type-2 dimension.

    Only keys present in the batch are rebuilt (their historical
    states are reconstructed from the dimension's intervals, unioned
    with the batch, and re-run through :func:`scd2_history`); all
    other rows pass through untouched — no full-dimension shuffle.
    """
    tracked = tracked or [
        c
        for c in batch.columns
        if c not in (key, ts)
    ]
    keys = batch.select(key).distinct()
    untouched = dim.join(F.broadcast(keys), key, "left_anti")
    touched_log = dim.join(F.broadcast(keys), key, "semi").select(
        key, F.col("valid_from").alias(ts), *tracked
    )
    rebuilt = scd2_history(
        touched_log.unionByName(batch.select(key, ts, *tracked)),
        key=key,
        ts=ts,
        tracked=tracked,
    )
    return untouched.unionByName(rebuilt)


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str = "key",
    ts: str = "ts",
    fact_key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-time lookup: join each fact row to the dimension
    VERSION whose [valid_from, valid_to) interval covers the fact's
    timestamp — the join every as-was report needs on a type-2
    dimension.

    Scale shape: dimensions are small relative to fact tables, so the
    version table is BROADCAST and the interval predicate rides along
    the key equi-join (one fact scan, zero fact shuffles). For a
    dimension too big to broadcast, the same plan works as a
    sort-merge equi-join on the key with the interval conjunct as a
    post-join filter — versions per key are few, so the inflation is
    bounded by the version count, not the interval span.
    """
    fact_key = fact_key or key
    cond = (
        (facts[fact_key] == dim[key])
        & (dim["valid_from"] <= facts[ts])
        & (dim["valid_to"].isNull() | (facts[ts] < dim["valid_to"]))
    )
    return facts.join(F.broadcast(dim), cond, how)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "key",
    tracked: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff: classify every key as added / removed / changed
    / unchanged between two table versions — the CDC primitive behind
    incremental pipelines and audit reports.

    One full-outer equi-join on the key (co-partitioned, uniform);
    presence indicators distinguish "absent" from "present with NULL
    attributes". Returns (key, status, old_*, new_*).
    """
    tracked = tracked or [c for c in old.columns if c != key]
    o = old.select(
        key,
        F.lit(1).alias("__o"),
        *[F.col(c).alias(f"old_{c}") for c in tracked],
    )
    n = new.select(
        key,
        F.lit(1).alias("__n"),
        *[F.col(c).alias(f"new_{c}") for c in tracked],
    )
    j = o.join(n, key, "full_outer")
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__o").isNull(), "added")
        .when(F.col("__n").isNull(), "removed")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    return j.select(
        key,
        status.alias("status"),
        *[F.col(f"old_{c}") for c in tracked],
        *[F.col(f"new_{c}") for c in tracked],
    )
