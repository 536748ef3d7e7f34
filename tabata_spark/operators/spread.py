"""Scale-adaptive scan-stage parallelization (r16 optimization).

The problem (opt guide §2.5 "input skew — one huge unsplittable
file"): a parquet file is split at ROW-GROUP granularity, so a table
written as a single row group scans as ONE task no matter how many
cores the session has. Any CPU-heavy expression placed before the
first exchange (salted md5 probes, n-gram/shingle construction, token
hashing) then runs single-threaded while the rest of the cluster
idles — measured at sf0.1/local[32]: the Bloom-probe filter of
q_bloom_join spent 4.4 s on one core vs 1.6 s spread, the trigram
construction of q_good_turing 2.2 s vs 1.0 s.

:func:`spread_scan` round-robin-repartitions such an input to the
session's default parallelism — but ONLY when the current partition
count cannot keep the cores busy. The condition, not the constant,
is what makes this scale-correct: at production scale any real table
has orders of magnitude more splits than cores, the branch is never
taken, and no exchange is added. Locally the branch keys off
``defaultParallelism`` (i.e. $SPARK_GRAFT_CPUS), so the driver's
lower-core bench runs spread proportionally less — nothing is tuned
to local[32].

Round-robin repartition is deterministic under retries (Spark sorts
before round-robin partitioning — SPARK-23207), and every consumer of
these inputs is partition-invariant by construction (the standing
shattered-split oracle sweep pins exactly that), so results are
byte-identical with and without the spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_scan"]


def spread_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session default parallelism when its
    current partitioning cannot fill the cores (fewer than half the
    session's default parallelism). No-op — and no added exchange —
    whenever the input already has enough splits, which is always the
    case at production scale."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur * 2 >= target:
        return df
    return df.repartition(target)
