"""Round-12 scale probes — one measured probe per changed family at a
size big enough to expose a wrong asymptotic shape (SCALE.md
discipline; the r11 lazy-rank bug was invisible below ~20M rows).

1. Grouped exact ntile (NEW this round): 21M rows in 3 heavy groups,
   via operators/ranking.with_exact_grouped_ntile (ONE range shuffle
   for all groups, per-(partition, group) offsets) vs the per-group
   window NTILE — equality asserted on the (group, bucket) histogram,
   both timed, storage back to baseline after release().
2. The melted RFM shape at 2M entities (the q_rfm_segments rewrite):
   melt → one grouped ntile → fold to the 125-cell grid, vs the r11
   chain of three full-frame with_exact_ntile checkpoints. Equality
   asserted on the full grid; empty storage after both.
3. Fold fast path at 20M: with_exact_rank(fold=) must match
   checkpoint-then-aggregate bit-for-bit and leave nothing cached.

    python tools/r12_probe.py [scale]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:58s} {time.perf_counter() - t0:7.1f} s  {str(out)[:70]}")
    return out


def _persisted(spark):
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def probe_grouped_ntile(spark, scale):
    from tabata_spark.operators.ranking import (
        release,
        with_exact_grouped_ntile,
    )

    df = spark.range(scale).select(
        "id",
        (F.col("id") % 3).cast("string").alias("g"),
        (F.abs(F.xxhash64("id", F.lit("v"))) % 1_000_000).alias("v"),
    ).persist()
    df.count()
    base = _persisted(spark)

    def grouped():
        out = with_exact_grouped_ntile(df, 5, "g", ["v", "id"], "t")
        h = sorted(
            (r["g"], r["t"], r["n"])
            for r in out.groupBy("g", "t")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        release(out)
        return h

    def window():
        w = Window.partitionBy("g").orderBy("v", "id")
        return sorted(
            (r["g"], r["t"], r["n"])
            for r in df.withColumn("t", F.ntile(5).over(w))
            .groupBy("g", "t")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    h1 = timed(
        f"grouped exact ntile (1 shuffle, 3 groups) {scale//1_000_000}M", grouped
    )
    assert _persisted(spark) == base, "released: df cache only"
    h2 = timed(f"per-group window ntile {scale//1_000_000}M", window)
    assert h1 == h2, (h1[:5], h2[:5])
    df.unpersist()


def probe_rfm_shapes(spark, entities):
    from tabata_spark.operators.ranking import (
        release,
        with_exact_grouped_ntile,
        with_exact_ntile,
    )

    cust = spark.range(entities).select(
        F.col("id").alias("k"),
        (F.abs(F.xxhash64("id", F.lit("r"))) % 3650).alias("recency"),
        (F.abs(F.xxhash64("id", F.lit("f"))) % 200).alias("freq"),
        (F.abs(F.xxhash64("id", F.lit("m"))) % 10_000_000)
        .cast("decimal(28,2)")
        .alias("mon"),
    ).persist()
    cust.count()
    base = _persisted(spark)

    def chained():  # the r11 shape: three full-frame checkpoints
        s1 = with_exact_ntile(cust, 5, [F.desc("recency"), F.asc("k")], "r")
        s2 = with_exact_ntile(s1, 5, [F.asc("freq"), F.asc("k")], "f")
        release(s1)
        s = with_exact_ntile(s2, 5, [F.asc("mon"), F.asc("k")], "m")
        release(s2)
        grid = sorted(
            map(
                tuple,
                s.groupBy("r", "f", "m")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("mon").cast("decimal(38,2)").alias("t"),
                )
                .collect(),
            )
        )
        release(s)
        return grid

    def melted():  # the r12 shape: one grouped ntile + fold
        def arm(sc, val):
            return cust.select(
                "k", F.lit(sc).alias("s"), val.cast("decimal(28,2)").alias("val")
            )

        m = (
            arm("r", -F.col("recency"))
            .unionByName(arm("f", F.col("freq")))
            .unionByName(arm("m", F.col("mon")))
        )

        def grid(t):
            pc = t.groupBy("k").agg(
                F.max(F.when(F.col("s") == "m", F.col("val"))).alias("mon"),
                F.max(F.when(F.col("s") == "r", F.col("b"))).alias("r"),
                F.max(F.when(F.col("s") == "f", F.col("b"))).alias("f"),
                F.max(F.when(F.col("s") == "m", F.col("b"))).alias("m"),
            )
            return pc.groupBy("r", "f", "m").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("mon").cast("decimal(38,2)").alias("t"),
            )

        out = with_exact_grouped_ntile(m, 5, "s", ["val", "k"], "b", fold=grid)
        return sorted(map(tuple, out.collect()))

    g1 = timed(f"RFM r11 chain (3 checkpoints) {entities//1_000_000}M", chained)
    assert _persisted(spark) == base
    g2 = timed(f"RFM r12 melt (1 grouped ntile + fold) {entities//1_000_000}M", melted)
    assert _persisted(spark) == base
    assert g1 == g2, "grids diverge"
    cust.unpersist()


def probe_fold_path(spark, scale):
    from tabata_spark.operators.ranking import release, with_exact_rank

    df = spark.range(scale).select(
        "id", (F.abs(F.xxhash64("id")) % 1_000_000).alias("v")
    ).persist()
    df.count()
    base = _persisted(spark)
    agg = lambda r: r.agg(  # noqa: E731
        F.sum((F.col("rk") * F.col("v")).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )

    def fold():
        return with_exact_rank(df, ["v", "id"], "rk", fold=agg).collect()

    def ckpt():
        r = with_exact_rank(df, ["v", "id"], "rk")
        out = agg(r).collect()
        release(r)
        return out

    a = timed(f"rank fold fast path {scale//1_000_000}M", fold)
    assert _persisted(spark) == base
    b = timed(f"rank checkpoint + aggregate {scale//1_000_000}M", ckpt)
    assert _persisted(spark) == base
    assert a == b
    df.unpersist()


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 21_000_000
    from tabata_spark.session import get_spark

    spark = get_spark("r12-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    probe_grouped_ntile(spark, scale)
    probe_rfm_shapes(spark, max(scale // 10, 1_000_000))
    probe_fold_path(spark, scale)
    print("r12 probes: all assertions passed")
    spark.stop()


if __name__ == "__main__":
    main()
