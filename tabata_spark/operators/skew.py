"""Skew-handling utilities for hot keys at scale.

AQE's skew-join splitting covers joins; for *aggregations* with hot
keys (a groupBy where one key owns 10% of a 100 TB table) the classic
remedy is salting: a two-phase aggregate where phase 1 groups on
(key, salt) to spread the hot key over N reducers and phase 2 merges
the partials. Correct for any algebraic aggregate (sum/count/min/max
and anything decomposable into them).

``salted_agg`` takes the decomposition explicitly; ``salted_avg`` and
``salted_count`` are the common shorthands.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, Column],
    merges: dict[str, Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    partials: output-name -> aggregate over the raw rows (phase 1,
    grouped on keys + salt). merges: output-name -> aggregate over the
    phase-1 partial columns (phase 2, grouped on keys alone, merge
    expressions referencing the partial names).

    Example (average)::

        salted_agg(df, ["k"],
            partials={"s": F.sum("v"), "c": F.count(F.lit(1))},
            merges={"avg_v": F.sum("s") / F.sum("c")})
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.abs(F.xxhash64(*keys, F.monotonically_increasing_id())), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merges.items()]
    )


def salted_count(df: DataFrame, keys: Sequence[str], salt_buckets: int = 32) -> DataFrame:
    return salted_agg(
        df,
        keys,
        partials={"__c": F.count(F.lit(1))},
        merges={"n": F.sum("__c")},
        salt_buckets=salt_buckets,
    )


def salted_avg(
    df: DataFrame, keys: Sequence[str], value: str, salt_buckets: int = 32
) -> DataFrame:
    return salted_agg(
        df,
        keys,
        partials={"__s": F.sum(F.col(f"`{value}`")), "__c": F.count(F.col(f"`{value}`"))},
        merges={f"avg_{value}": F.sum("__s") / F.sum("__c")},
        salt_buckets=salt_buckets,
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join shape: when the small side fits in memory, a
    broadcast join has NO key-skew exposure at all (no shuffle of the
    big side). This is the first remedy to reach for — salting a
    sort-merge join is only needed when neither side broadcasts;
    within Spark, AQE's skewJoin handles that case."""
    return big.join(F.broadcast(small), list(on), how)
