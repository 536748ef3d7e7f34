"""Bucketed relational warehouse: the fact-fact join must be
exchange-free when both sides are bucketed on the join key
(sources/warehouse.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabata_spark.plans.inspect import plan_counts
from tabata_spark.sources.relational import load_table
from tabata_spark.sources.warehouse import bucket_fact_tables


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return bucket_fact_tables(
        spark,
        {
            "bt_lineitem": (li, "l_orderkey"),
            "bt_orders": (o, "o_orderkey"),
        },
        num_buckets=4,
    )


def test_bucketed_join_is_exchange_free(spark, bucketed):
    """lineitem ⋈ orders on orderkey: both sides bucketed on the key
    → zero Exchange in the plan (the 100 TB recurring-join layout).
    A plain parquet join of the same frames shuffles both sides.
    The merge hint models the at-scale case: at sf0.001 Catalyst
    rightly broadcasts tiny orders instead, which would bypass the
    bucketed path this test pins."""
    j = bucketed["bt_lineitem"].join(
        bucketed["bt_orders"].hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = j.groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("q"))
    cj = plan_counts(j)
    assert cj["exchanges"] == 0, cj
    # the aggregation after the join still shuffles once (different
    # key) — bucketing removed only the join exchanges, as designed
    ca = plan_counts(agg)
    assert ca["exchanges"] == 1, ca


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    got = (
        bucketed["bt_lineitem"]
        .join(bucketed["bt_orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_scan_reports_partitioning(spark, bucketed):
    """Inside the join plan, both scans must run in bucketed mode
    (``Bucketed: true``) — the property the exchange elimination hangs
    on. (A standalone scan rightly shows ``Bucketed: false (disabled
    by query planner)``: autoBucketedScan drops bucketing when no
    operator needs the partitioning.)"""
    from tabata_spark.plans.inspect import explain_str

    j = bucketed["bt_lineitem"].join(
        bucketed["bt_orders"].hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    s = explain_str(j)
    assert s.count("Bucketed: true") == 2, s[:1200]
