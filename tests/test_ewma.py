"""EWMA operator: pandas ewm(adjust=True) parity (exact on series
shorter than the lookback, where truncation is a no-op), plus plan
shape (single exchange, shared record partitioning)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tabata_spark.operators.ewma import ewma, ewma_weights


@pytest.fixture(scope="module")
def sig(spark):
    rows = []
    for rec in range(5):
        for i in range(20):  # shorter than the default 32-row lookback
            rows.append((rec, i, float((rec * 31 + i * 17) % 97) / 10.0))
    return spark.createDataFrame(rows, "record_id long, seq long, value double")


def test_matches_pandas_ewm_exactly_below_lookback(sig):
    out = ewma(sig, alpha=0.3, lookback=32, decimals=None).orderBy(
        "record_id", "seq"
    )
    got = out.toPandas()
    for rec, grp in got.groupby("record_id"):
        expected = (
            grp.sort_values("seq")["value"].ewm(alpha=0.3, adjust=True).mean()
        )
        assert grp.sort_values("seq")["ewma"].values == pytest.approx(
            expected.values, abs=1e-12
        )


def test_weights_are_geometric():
    w = ewma_weights(0.5, 5)
    assert w == [1.0, 0.5, 0.25, 0.125, 0.0625]


def test_first_row_equals_value(sig):
    out = ewma(sig, alpha=0.2).filter(F.col("seq") == 0)
    assert all(r["ewma"] == pytest.approx(r["value"], abs=1e-9) for r in out.collect())


def test_single_exchange_plan(sig):
    plan = (
        ewma(sig, alpha=0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1
