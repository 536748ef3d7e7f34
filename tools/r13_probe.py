"""Round-13 scale probes — the measured cost of the DURABLE
checkpoint opt-in (``reliable=True``) the round added to k_core and
that ranking gained in r12, at sizes where the checkpoint write is
real (SCALE.md discipline: never ship a knob without its price tag).

1. with_exact_rank at 21M rows: default localCheckpoint vs
   reliable=True (checkpoint files through a local checkpoint dir —
   on a cluster this is HDFS/object store; local disk here still
   measures the serialize+write+read round trip). Bit-equality of a
   full-frame aggregate asserted across modes.
2. k_core on a ~20M-edge graph with a long peel cascade: default vs
   reliable=True; identical surviving cores asserted.

    python tools/r13_probe.py [scale]
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
    print(f"{label:58s} {time.perf_counter() - t0:7.1f} s  {str(out)[:70]}")
    return out


def probe_rank_reliable(spark, scale):
    from tabata_spark.operators.ranking import release, with_exact_rank

    df = spark.range(scale).select(
        "id", (F.abs(F.xxhash64("id", F.lit("v"))) % 1_000_000).alias("v")
    ).persist()
    df.count()

    def run(reliable):
        out = with_exact_rank(df, ["v", "id"], "rk", reliable=reliable)
        row = out.agg(
            F.sum(
                (F.col("rk") * F.col("v")).cast("decimal(38,0)")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        release(out)  # no-op for reliable results, frees local blocks
        return (row["s"], row["n"])

    a = timed(f"with_exact_rank default (localCheckpoint) {scale}", lambda: run(False))
    b = timed(f"with_exact_rank reliable=True (durable ckpt) {scale}", lambda: run(True))
    assert a == b, (a, b)
    df.unpersist()


def probe_kcore_reliable(spark, n_nodes, avg_deg):
    from tabata_spark.operators.graph import k_core

    # ring-of-cliques graph: a dense 2-core plus pendant chains that
    # peel over many rounds (the every-4th-round checkpoint cadence
    # fires several times)
    m = n_nodes * avg_deg // 2
    e = spark.range(m).select(
        (F.abs(F.xxhash64("id", F.lit("a"))) % n_nodes).alias("src"),
        (F.abs(F.xxhash64("id", F.lit("b"))) % n_nodes).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    n_edges = edges.count()
    # just under the Poisson mean degree (~avg_deg after symmetrize):
    # a real surviving core AND a multi-round peel cascade (k = mean
    # degree empties the graph in a few collapse rounds — weaker
    # evidence for the every-4th-round checkpoint cadence)
    k = avg_deg - 3

    def run(reliable):
        out = k_core(edges, k=k, max_rounds=30, reliable=reliable)
        row = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("degree").alias("sd")
        ).collect()[0]
        return (row["n"], row["sd"])

    a = timed(f"k_core default ({n_edges} sym edges, k={k})", lambda: run(False))
    b = timed(f"k_core reliable=True ({n_edges} sym edges, k={k})", lambda: run(True))
    assert a == b, (a, b)
    edges.unpersist()


def main():
    from tabata_spark.session import get_spark

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 21_000_000
    spark = get_spark("r13-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ckpt = tempfile.mkdtemp(prefix="r13ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        probe_rank_reliable(spark, scale)
        probe_kcore_reliable(spark, n_nodes=2_000_000, avg_deg=10)
        print("r13 probes: all assertions passed")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
