"""Round-7 scale probes: LTTB downsampling, transactional table log,
KMV overlap — the SCALE.md discipline (one measured probe per new
family at a size big enough to expose a wrong asymptotic shape).

    python tools/r7_probe.py   # ~2-4 min, prints one line per probe
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:55s} {time.perf_counter() - t0:7.1f} s  {out}")


def main():
    from tabata_spark.session import get_spark

    spark = get_spark("r7-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base = tempfile.mkdtemp(prefix="r7probe_")

    # --- LTTB: 2000 series x 10k points = 20M rows -> 100 buckets ---
    from tabata_spark.operators.asof import lttb_downsample

    sig = spark.range(20_000_000).select(
        (F.col("id") / 10_000).cast("long").alias("record_id"),
        F.pmod(F.col("id"), F.lit(10_000)).alias("seq"),
        (
            F.sin(F.col("id").cast("double") / 97.0)
            + F.col("id").cast("double") / 1e7
        ).alias("value"),
    )
    sig_path = os.path.join(base, "sig")
    sig.write.parquet(sig_path)
    sigp = spark.read.parquet(sig_path)
    timed(
        "lttb 20M pts, 2000 series, 100 buckets",
        lambda: lttb_downsample(sigp, n_buckets=100).count(),
    )

    # --- txlog: 10 x 1M-row appends, point merge, delete, compact ---
    from tabata_spark.sources.txlog import (
        tx_compact,
        tx_delete_where,
        tx_merge,
        tx_read,
        tx_write,
    )

    root = os.path.join(base, "tx")

    def appends():
        for i in range(10):
            tx_write(
                spark.range(i * 1_000_000, (i + 1) * 1_000_000).select(
                    "id", (F.col("id") % 1000).alias("k")
                ),
                root,
            )
        return tx_read(spark, root).count()

    timed("txlog 10 x 1M-row append commits", appends)
    src = spark.range(500).select(
        (F.col("id") * 20_000).alias("id"), F.lit(-1).cast("long").alias("k")
    )
    timed(
        "txlog merge 500 keys into 10M rows (CoW)",
        lambda: tx_merge(spark, root, src, ["id"]),
    )
    timed(
        "txlog delete k=7 from 10M rows (CoW)",
        lambda: tx_delete_where(spark, root, F.col("k") == 7),
    )
    timed("txlog compact 10M rows -> 8 files", lambda: tx_compact(spark, root, 8))
    timed("txlog snapshot read count", lambda: tx_read(spark, root).count())

    # --- KMV: 2 x 10M-key sets, 5M overlap, k=1024 ---
    from tabata_spark.operators.sketch import kmv_build, kmv_set_ops

    a = spark.range(10_000_000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(5_000_000, 15_000_000).select(
        F.col("id").cast("string").alias("k")
    )

    def kmv():
        ska = kmv_build(a, "k", k=1024)
        skb = kmv_build(b, "k", k=1024)
        r = kmv_set_ops(ska, skb, k=1024).collect()[0]
        return (
            f"union~{r['est_union']:.3g} inter~{r['est_intersection']:.3g} "
            f"jacc~{r['jaccard']:.3f} (true: 15M / 5M / 0.333)"
        )

    timed("kmv overlap 2 x 10M keys (5M shared), k=1024", kmv)

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()




def probe_sssp():
    """Separate entry: 20M-edge bounded-BFS probe (run after main)."""
    from pyspark.sql import functions as F

    from tabata_spark.operators.graph import bounded_shortest_paths
    from tabata_spark.session import get_spark

    spark = get_spark("r7-sssp-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import tempfile

    base = tempfile.mkdtemp(prefix="r7sssp_")
    # 20 distinct out-edges per node (the first multiplier collapsed
    # mod 1M and gave every node ONE dst — a chain, not a graph)
    edges = spark.range(20_000_000).select(
        (F.col("id") % 1_000_000).alias("src"),
        (
            (F.col("id") % 1_000_000) * 37
            + (F.col("id") / 1_000_000).cast("long") * 1009
            + 1
        ).alias("dst"),
    ).withColumn("dst", F.pmod(F.col("dst"), F.lit(1_000_000)))
    ep = base + "/edges"
    edges.write.parquet(ep)
    e = spark.read.parquet(ep)
    seeds = spark.range(10).select(F.col("id").alias("node"))
    timed(
        "bounded BFS 3 hops, 1M nodes / 20M edges",
        lambda: bounded_shortest_paths(e, seeds, max_hops=3).count(),
    )
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    import sys as _sys

    if "--sssp" in _sys.argv:
        probe_sssp()
    else:
        main()
