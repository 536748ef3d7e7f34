"""As-of join + linear resampling tests (operators/asof.py). The
battery additionally checks asof_join against DuckDB's native ASOF
JOIN (j_asof_purchase)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from tabata_spark.operators.asof import asof_join, resample_linear

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("a", _ts(0), 100.0),
            ("a", _ts(10), 101.0),
            ("a", _ts(20), 102.0),
            ("b", _ts(5), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("a", _ts(4), 1),
            ("a", _ts(10), 2),  # tie with a quote
            ("a", _ts(25), 3),
            ("b", _ts(1), 4),  # before any quote
            ("c", _ts(9), 5),  # key with no quotes at all
        ],
        "sym string, ts timestamp, qty int",
    )
    return quotes, trades


def test_asof_backward_with_ties(quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r["qty"]: (r["px"], r["matched_ts"])
        for r in asof_join(
            trades, quotes, key_cols=["sym"], value_cols=["px"]
        ).collect()
    }
    assert out[1] == (100.0, _ts(0))
    assert out[2] == (101.0, _ts(10))  # ts-equal quote IS visible
    assert out[3] == (102.0, _ts(20))
    assert out[4] == (None, None)  # nothing at-or-before
    assert out[5] == (None, None)  # unseen key


def test_asof_strict_hides_equal_ts(quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r["qty"]: r["px"]
        for r in asof_join(
            trades, quotes, key_cols=["sym"], value_cols=["px"], strict=True
        ).collect()
    }
    assert out[2] == 100.0  # the ts-equal quote is hidden under strict <


def test_asof_tolerance(quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r["qty"]: r["px"]
        for r in asof_join(
            trades,
            quotes,
            key_cols=["sym"],
            value_cols=["px"],
            tolerance_s=4.0,
        ).collect()
    }
    assert out[1] == 100.0  # 4s old: inside tolerance
    assert out[3] is None  # 5s old: stale, nulled


def test_asof_forward_with_ties(quotes_trades):
    """direction='forward': smallest right ts >= left ts; equal-ts
    visible non-strict, hidden strict; pandas merge_asof parity."""
    import pandas as pd

    quotes, trades = quotes_trades
    out = {
        r["qty"]: (r["px"], r["matched_ts"])
        for r in asof_join(
            trades, quotes, key_cols=["sym"], value_cols=["px"],
            direction="forward",
        ).collect()
    }
    assert out[1] == (101.0, _ts(10))  # next quote after t=4
    assert out[2] == (101.0, _ts(10))  # ts-equal quote IS visible
    assert out[3] == (None, None)      # nothing at-or-after t=25
    assert out[4] == (50.0, _ts(5))    # b: next quote after t=1
    assert out[5] == (None, None)      # unseen key

    # full parity with pandas merge_asof(direction='forward')
    q = quotes.toPandas().sort_values("ts")
    t = trades.toPandas().sort_values("ts")
    want = pd.merge_asof(t, q, on="ts", by="sym", direction="forward")
    want_map = {
        int(r.qty): (None if pd.isna(r.px) else float(r.px))
        for r in want.itertuples()
    }
    assert {k: v[0] for k, v in out.items()} == want_map

    strict = {
        r["qty"]: r["px"]
        for r in asof_join(
            trades, quotes, key_cols=["sym"], value_cols=["px"],
            direction="forward", strict=True,
        ).collect()
    }
    assert strict[2] == 102.0  # equal-ts quote hidden under strict >


def test_asof_forward_tolerance(quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r["qty"]: r["px"]
        for r in asof_join(
            trades, quotes, key_cols=["sym"], value_cols=["px"],
            direction="forward", tolerance_s=4.0,
        ).collect()
    }
    assert out[4] == 50.0   # 4 s ahead: inside tolerance
    assert out[1] is None   # next quote is 6 s ahead: nulled


def test_asof_single_shuffle_no_join(quotes_trades, spark):
    from tabata_spark.plans.inspect import plan_counts

    quotes, trades = quotes_trades
    c = plan_counts(
        asof_join(trades, quotes, key_cols=["sym"], value_cols=["px"])
    )
    assert c["sortmerge_joins"] == 0 and c["broadcast_joins"] == 0, c
    assert c["exchanges"] == 1, c  # one shuffle on the key, no join
    assert c["python_evals"] == 0, c


def test_resample_linear_matches_numpy(spark):
    t = [0.0, 10.0, 15.0, 40.0]
    v = [0.0, 10.0, 5.0, 30.0]
    df = spark.createDataFrame(
        [("r", _ts(int(s)), x) for s, x in zip(t, v)],
        "record_id string, ts timestamp, y double",
    )
    out = (
        resample_linear(df, step_s=5.0)
        .orderBy("grid_ts_s")
        .collect()
    )
    base = out[0]["grid_ts_s"]
    got_t = [r["grid_ts_s"] - base for r in out]
    got_v = [r["y"] for r in out]
    want_t = np.arange(0.0, 41.0, 5.0)
    abs_t = [float(s + base) for s in want_t]
    want_v = np.interp(
        [b - base for b in abs_t],
        t,
        v,
    )
    assert got_t == [float(x) for x in want_t]
    np.testing.assert_allclose(got_v, want_v, atol=1e-9)


def test_resample_grid_point_on_sample_takes_sample(spark):
    df = spark.createDataFrame(
        [("r", _ts(0), 1.0), ("r", _ts(5), 99.0), ("r", _ts(10), 3.0)],
        "record_id string, ts timestamp, y double",
    )
    out = {
        r["grid_ts_s"]: r["y"]
        for r in resample_linear(df, step_s=5.0).collect()
    }
    t0 = min(out)
    assert out[t0 + 5.0] == 99.0  # exact sample, not an interpolation


def test_lttb_selects_extremes_and_covers_buckets(spark):
    from tabata_spark.operators.asof import lttb_downsample

    # A spike in the middle of an otherwise flat series must be the
    # selected point of its bucket (largest triangle), and the first/
    # last series points must always be kept.
    rows = [(1, s, 100.0 if s == 47 else float(s % 3)) for s in range(100)]
    df = spark.createDataFrame(rows, "record_id int, seq long, value double")
    out = lttb_downsample(df, n_buckets=10).collect()
    by_bucket = {r["bucket"]: r for r in out}
    assert len(out) == 10  # one point per non-empty bucket
    assert by_bucket[0]["seq"] == 0  # classic LTTB endpoints
    assert by_bucket[9]["seq"] == 99
    spike_bucket = min(9, (47 - 0) * 10 // 99)
    assert by_bucket[spike_bucket]["seq"] == 47  # spike survives


def test_lttb_matches_pandas_fixed_anchor_reference(spark):
    import pandas as pd

    from tabata_spark.operators.asof import lttb_downsample

    rng = np.random.RandomState(7)
    n, nb = 200, 20
    vals = np.round(rng.randn(n).cumsum(), 3)
    rows = [(1, s, float(vals[s])) for s in range(n)]
    df = spark.createDataFrame(rows, "record_id int, seq long, value double")
    got = {
        r["bucket"]: (r["seq"], r["value"])
        for r in lttb_downsample(df, n_buckets=nb).collect()
    }
    # reference: same fixed-anchor algorithm, row-at-a-time in pandas
    pdf = pd.DataFrame({"seq": range(n), "value": vals})
    lo, hi = 0, n - 1
    pdf["b"] = np.minimum((pdf["seq"] - lo) * nb // max(hi - lo, 1), nb - 1)
    av = pdf.groupby("b").agg(ax=("seq", "mean"), ay=("value", "mean"))
    want = {}
    for b, grp in pdf.groupby("b"):
        if b == 0:
            sel = grp.iloc[0]
        elif b == nb - 1:
            sel = grp.iloc[-1]
        else:
            lxy = av.loc[b - 1] if (b - 1) in av.index else None
            rxy = av.loc[b + 1] if (b + 1) in av.index else None
            area = (
                (lxy["ax"] - rxy["ax"]) * (grp["value"] - lxy["ay"])
                - (lxy["ax"] - grp["seq"]) * (rxy["ay"] - lxy["ay"])
            ).abs() / 2.0
            sel = grp.loc[area.round(6).idxmax()]
        want[int(b)] = (int(sel["seq"]), float(sel["value"]))
    assert got == want
