"""Round-8 scale probes #4: association rules and k-core at 20M rows
— the SCALE.md discipline (one measured probe per new family at a
size big enough to expose a wrong asymptotic shape).

Association rules: 20M (basket, item) rows, 2M baskets x ~10 items
drawn zipf-ish from a 100k-item vocabulary — the regime where the
apriori frequent-item prefilter actually prunes (most of a 100k
vocabulary is infrequent) and the basket self-join must stay
collision-bounded, plus a mega-basket to prove the cap guard.

k-core: the r7 graph-probe generator (20M edges over 2M nodes,
power-ish degree mix) peeled at k=8.

    python tools/r8d_probe.py [scale]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:55s} {time.perf_counter() - t0:7.1f} s  {out}")


def main():
    from tabata_spark.operators.assoc import association_rules
    from tabata_spark.operators.graph import k_core
    from tabata_spark.session import get_spark

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("r8d-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # --- association rules: 2M baskets x 10 items, zipf-ish items ---
    # item = a hash-derived rank^2-skewed draw from 100k: a few
    # hundred items are frequent, the long tail is not — the apriori
    # prefilter's target shape.
    n_baskets = scale // 10
    rows = spark.range(scale).select(
        (F.col("id") % n_baskets).alias("basket"),
        (
            F.pow(
                (F.abs(F.xxhash64("id", F.lit("it"))) % 1_000_000)
                / 1_000_000.0,
                F.lit(3.0),
            )
            * 100_000
        )
        .cast("long")
        .alias("item"),
    )
    # one adversarial mega-basket touching 5k distinct items
    mega = spark.range(5_000).select(
        F.lit(-1).cast("long").alias("basket"), F.col("id").alias("item")
    )
    baskets = rows.unionByName(mega).persist()
    baskets.count()

    timed(
        f"assoc rules {scale // 1_000_000}M rows, minsup 10k, capped",
        lambda: association_rules(
            baskets,
            "basket",
            "item",
            min_support=10_000,
            max_basket_items=100,
        ).count(),
    )
    baskets.unpersist()

    # --- k-core: 20M-edge graph, k=8 ---
    n_nodes = scale // 10
    e = spark.range(scale // 2).select(
        (F.abs(F.xxhash64("id", F.lit("s"))) % n_nodes).alias("src"),
        (F.abs(F.xxhash64("id", F.lit("d"))) % (F.col("id") % 1000 + 2)).alias(
            "dst"
        ),
    ).filter(F.col("src") != F.col("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    m = edges.count()
    timed(
        f"k-core k=8 over {m} sym edges",
        lambda: k_core(edges, k=8, max_rounds=12).count(),
    )
    edges.unpersist()


if __name__ == "__main__":
    main()
