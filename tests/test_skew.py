import pytest
from pyspark.sql import functions as F

from tabata_spark.operators.skew import salted_agg, salted_avg, salted_count


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key owning ~90% of rows
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 17).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_count_equals_direct(skewed):
    direct = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count(skewed, ["k"]).collect()}
    assert salted == direct


def test_salted_avg_equals_direct(skewed):
    direct = {
        r["k"]: r["a"] for r in skewed.groupBy("k").agg(F.avg("v").alias("a")).collect()
    }
    salted = {r["k"]: r["avg_v"] for r in salted_avg(skewed, ["k"], "v").collect()}
    assert set(salted) == set(direct)
    for k in direct:
        assert abs(salted[k] - direct[k]) < 1e-9


def test_salted_agg_min_max(skewed):
    out = {
        r["k"]: (r["mn"], r["mx"])
        for r in salted_agg(
            skewed,
            ["k"],
            partials={"__mn": F.min("v"), "__mx": F.max("v")},
            merges={"mn": F.min("__mn"), "mx": F.max("__mx")},
        ).collect()
    }
    direct = {
        r["k"]: (r["mn"], r["mx"])
        for r in skewed.groupBy("k").agg(F.min("v").alias("mn"), F.max("v").alias("mx")).collect()
    }
    assert out == direct
