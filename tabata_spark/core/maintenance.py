"""Store maintenance — compaction and stat-friendly layout for the
partitioned parquet stores the engine writes (SignalSet.put upserts,
streaming foreachBatch sinks).

Recurring micro-batch writes accumulate small files per partition;
at scale that degrades scans twice over (file-open overhead, and
row-group stats too fragmented to skip anything). ``compact_store``
rewrites each partition to ~``files_per_partition`` files with rows
sorted by the sort column INSIDE each file, so parquet row-group
min/max stats become tight ranges — a ts-predicate scan can then skip
whole row groups (the poor man's Z-order for a single sort
dimension, which is exactly the signal-store access pattern:
record-partitioned, time-ordered reads).

Safety: the rewrite stages into ``<path>.__compact__`` and swaps via
two renames, so a reader never sees a HALF-WRITTEN store. The swap is
not fully atomic: between the two renames there is a brief window
with no directory at ``path`` at all (a concurrent open fails cleanly
rather than reading partial data), and a crash inside the window
leaves the complete store at ``<path>.__old__`` for manual recovery.
Stale ``.__compact__``/``.__old__`` leftovers from a crashed prior
run are removed at entry. (On object stores a real deployment would
commit via a manifest/table format; directory-swap is the filesystem
analog.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_store(
    spark: SparkSession,
    path: str,
    partition_col: str = "record_id",
    sort_col: str = "seq",
    files_per_partition: int = 1,
) -> None:
    """Rewrite a partitioned parquet store with at most
    ``files_per_partition`` files per partition, each sorted by
    ``sort_col`` (tight row-group stats → data skipping on range
    predicates). One file per partition by default; pass a higher
    count when single partitions outgrow one task's write (the salt
    spreads rows deterministically by the sort column's hash)."""
    staged = path.rstrip("/") + ".__compact__"
    old = path.rstrip("/") + ".__old__"
    # crash recovery BEFORE any deletion: if a prior run died between
    # the two renames, `path` is gone and `.__old__` holds the ONLY
    # complete copy — restore it first (deleting it here would destroy
    # the store). Only then clear stale leftovers: a stale .__compact__
    # would make the overwrite-write merge with garbage and a stale
    # .__old__ (with `path` present) would fail the first rename below.
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no store at {path} and no {old} to recover")
    for stale in (staged, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    df = spark.read.parquet(path)
    n = _n_partitions(df, partition_col)
    keys = [F.col(partition_col)]
    if files_per_partition > 1:
        keys.append(
            F.pmod(F.xxhash64(F.col(sort_col)), F.lit(files_per_partition))
        )
    (
        df.repartition(files_per_partition * n, *keys)
        .sortWithinPartitions(partition_col, sort_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(staged)
    )
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)


def _n_partitions(df: DataFrame, partition_col: str) -> int:
    # distinct partition values — the store's partition count; a tiny
    # aggregate (one row per partition value)
    return df.select(partition_col).distinct().count()


def store_file_stats(spark: SparkSession, path: str) -> dict[str, int]:
    """(n_files, n_partitions) of a partitioned parquet store — the
    before/after evidence for compaction."""
    n_files = 0
    parts = set()
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                rel = os.path.relpath(root, path)
                if "=" in rel:
                    parts.add(rel)
    return {"n_files": n_files, "n_partitions": len(parts)}


def zorder_rank(col: Column | str, vmin: int, vmax: int, bits: int = 10) -> Column:
    """Integer rank of a column in [0, 2^bits): shift out the low
    bits, ``(v - min) >> (span_bits - bits)`` — exact BIGINT-only
    arithmetic (a multiply-divide normalization overflows the double
    53-bit mantissa for µs-epoch spans), so the key is bit-reproducible
    in any engine with integer shifts."""
    c = F.col(col) if isinstance(col, str) else col
    span = max(1, int(vmax) - int(vmin))
    shift = max(0, span.bit_length() - bits)
    return F.shiftright((c.cast("long") - F.lit(int(vmin))), shift)


def zorder_key(
    ranked: list[Column], bits: int = 10
) -> Column:
    """Morton (Z-order) interleave of k pre-ranked columns: bit b of
    rank i lands at position ``b*k + i``. Pure JVM bitwise expression
    (k·bits terms) — the multi-dimension generalization of the single
    sort column: sorting by this key makes EVERY participating
    column's per-file min/max range narrow, so parquet row-group
    stats prune multi-dimensional box predicates instead of just the
    leading sort dimension."""
    k = len(ranked)
    if k * bits > 62:
        raise ValueError(f"k*bits = {k * bits} exceeds one signed long key")
    z = F.lit(0).cast("long")
    for i, r in enumerate(ranked):
        for b in range(bits):
            z = z + F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)), b * k + i)
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int = 8,
) -> dict[str, tuple[int, int]]:
    """Cluster a store by Z-order over ``cols`` (integer-valued):
    bounds from ONE scalar aggregation (folded back as literals),
    range-partition by the interleaved key into ``n_files`` files,
    rows sorted by key within each file. Returns the bounds used.

    At 100 TB this is the layout step of an ingest/compaction job;
    scans with box predicates on any subset of ``cols`` then skip
    files and row groups via ordinary parquet min/max stats — no
    index structure, no engine extension."""
    row = df.agg(
        *[F.min(c).cast("long").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    if any(row[f"__mn_{c}"] is None for c in cols):
        # empty input (or all-null key): nothing to cluster — write
        # the (empty) store so downstream readers still find a table
        df.write.mode("overwrite").parquet(path)
        return {}
    bounds = {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}
    ranked = [zorder_rank(c, *bounds[c], bits=bits) for c in cols]
    keyed = df.withColumn("__z", zorder_key(ranked, bits=bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds
