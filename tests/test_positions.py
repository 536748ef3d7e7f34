import numpy as np
from pyspark.sql import functions as F

from tabata_spark.operators.positions import with_positions


def test_positions_match_numpy(sset):
    df = with_positions(sset.df)
    name = sset.records[0]
    pdf = (
        df.filter(F.col("record_id") == name)
        .orderBy("seq")
        .select("seq", "`LEN[pts]`", "`REV[pts]`", "`PERCENT[%]`")
        .toPandas()
    )
    n = len(pdf)
    # reference instants.py:306-307,516-520 semantics
    np.testing.assert_allclose(pdf["LEN[pts]"], np.arange(n))
    np.testing.assert_allclose(pdf["REV[pts]"], np.flip(np.arange(n)))
    np.testing.assert_allclose(pdf["PERCENT[%]"], np.arange(n) / (n - 1))


def test_positions_per_record_independent(sset):
    df = with_positions(sset.df)
    agg = (
        df.groupBy("record_id")
        .agg(
            F.max("`LEN[pts]`").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.min("`REV[pts]`").alias("rmn"),
            F.max("`PERCENT[%]`").alias("pmx"),
        )
        .collect()
    )
    for r in agg:
        assert r["mx"] == r["n"] - 1
        assert r["rmn"] == 0.0
        assert abs(r["pmx"] - 1.0) < 1e-12
