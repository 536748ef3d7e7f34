"""Drift statistics (stats.chi_squared_independence / stats.psi_drift):
pandas-reference parity on driver testdata, plus shape invariants.
(The DuckDB oracles in battery.py are the second independent check;
this is the third path, computed row-at-a-time in pandas.)"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tabata_spark.operators.stats import chi_squared_independence, psi_drift

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pdf():
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, source, lang, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).df()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_chi2_matches_pandas_reference(docs, pdf):
    row = chi_squared_independence(docs, "source", "lang").collect()[0]
    tab = pd.crosstab(pdf["source"], pdf["lang"])
    n = tab.values.sum()
    chi2 = 0.0
    for r in tab.index:
        for c in tab.columns:
            o = tab.loc[r, c]  # full grid: zero cells contribute E
            e = tab.loc[r].sum() * tab[c].sum() / n
            chi2 += round((o - e) ** 2 / e, 6)
    assert row["n"] == n
    assert row["dof"] == (len(tab.index) - 1) * (len(tab.columns) - 1)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-9)


def test_chi2_sparse_table_counts_zero_cells(spark):
    # The drift signature: category r2 appears ONLY under column cB.
    # Full-grid chi2 must include the (r2, cA) zero cell's E term —
    # reference value from scipy.stats.chi2_contingency semantics.
    rows = (
        [("r0", "cA")] * 10 + [("r0", "cB")] * 10
        + [("r1", "cA")] * 10 + [("r1", "cB")] * 10
        + [("r2", "cB")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_squared_independence(df, "a", "b").collect()[0]
    tab = {("r0", "cA"): 10, ("r0", "cB"): 10, ("r1", "cA"): 10,
           ("r1", "cB"): 10, ("r2", "cA"): 0, ("r2", "cB"): 10}
    rt = {"r0": 20, "r1": 20, "r2": 10}
    ct = {"cA": 20, "cB": 30}
    n = 50
    expect = sum(
        round((o - rt[r] * ct[c] / n) ** 2 / (rt[r] * ct[c] / n), 6)
        for (r, c), o in tab.items()
    )
    assert out["dof"] == 2
    assert out["chi2"] == pytest.approx(expect, abs=1e-9)
    assert out["chi2"] > 5.0  # observed-cells-only would report ~3.1


def test_chi2_zero_for_independent_construction(spark):
    # A perfectly balanced table has chi2 == 0 exactly.
    rows = [(f"r{i % 4}", f"c{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_squared_independence(df, "a", "b").collect()[0]
    assert out["chi2"] == 0.0
    assert out["dof"] == 6


def test_psi_matches_pandas_reference(docs, pdf):
    row = psi_drift(
        docs,
        (F.col("n_chars") / 100).cast("long"),
        "source",
        ("src0", "src1"),
    ).collect()[0]
    sub = pdf[pdf["source"].isin(["src0", "src1"])].copy()
    sub["bkt"] = sub["n_chars"] // 100
    pool = (
        sub.groupby("bkt")["source"]
        .agg(ca=lambda s: (s == "src0").sum(), cb=lambda s: (s == "src1").sum())
        .reset_index()
    )
    na, nb, k = pool["ca"].sum(), pool["cb"].sum(), len(pool)
    psi = 0.0
    for _, r in pool.iterrows():
        p = (r["ca"] + 0.5) / (na + 0.5 * k)
        q = (r["cb"] + 0.5) / (nb + 0.5 * k)
        psi += round((p - q) * math.log(p / q), 6)
    assert (row["n_a"], row["n_b"], row["n_buckets"]) == (na, nb, k)
    assert row["psi"] == pytest.approx(psi, abs=1e-9)


def test_psi_zero_for_identical_distributions(spark):
    rows = [(i % 7, g) for i in range(700) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "bkt long, grp string")
    out = psi_drift(df, "bkt", "grp", ("a", "b")).collect()[0]
    assert out["psi"] == 0.0
    assert out["n_buckets"] == 7


def test_conformal_qhat_exact_rank_and_coverage(spark):
    import numpy as np

    from tabata_spark.operators.stats import conformal_qhat

    rng = np.random.RandomState(3)
    scores = np.abs(rng.randn(200)).round(6)
    cal = spark.createDataFrame(
        [(int(i), float(s)) for i, s in enumerate(scores)], "id long, s double"
    )
    row = conformal_qhat(cal, "s", alpha_num=1, alpha_den=10, order_col="id").collect()[0]
    # exact: k = ceil(201 * 9 / 10) = ceil(180.9) = 181 -> 181st smallest
    k = -(-201 * 9 // 10)
    want = float(np.sort(scores)[k - 1])
    assert row["n_cal"] == 200 and row["q_hat"] == pytest.approx(want, abs=1e-12)
    # coverage guarantee on a fresh exchangeable sample: >= 1 - alpha
    # (deterministic given the fixed seed)
    fresh = np.abs(rng.randn(2000))
    assert (fresh <= row["q_hat"]).mean() >= 0.88


def test_conformal_qhat_grouped_small_n_clamps(spark):
    from tabata_spark.operators.stats import conformal_qhat

    cal = spark.createDataFrame(
        [("g1", i, float(i)) for i in range(5)]
        + [("g2", i, float(10 * i)) for i in range(40)],
        "g string, id long, s double",
    )
    rows = {
        r["g"]: (r["n_cal"], r["q_hat"])
        for r in conformal_qhat(
            cal, "s", group_cols=["g"], order_col="id"
        ).collect()
    }
    # g1: k = min(5, ceil(6*9/10)=6) = 5 -> max score
    assert rows["g1"] == (5, 4.0)
    # g2: k = ceil(41*9/10) = 37 -> 37th smallest = 360.0
    assert rows["g2"] == (40, 360.0)


def test_mutual_information_reference_values(spark):
    import math

    from tabata_spark.operators.stats import mutual_information

    # independent -> MI == 0 exactly
    rows = [(f"x{i % 4}", f"y{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, "a string, b string")
    assert mutual_information(df, "a", "b").collect()[0]["mi_nats"] == 0.0

    # perfectly dependent (y = f(x), uniform over 4 values) -> ln(4)
    rows = [(f"x{i % 4}", f"y{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = mutual_information(df, "a", "b").collect()[0]["mi_nats"]
    assert abs(got - math.log(4)) < 1e-4

    # hand-computed 2x2: joint [[30,10],[10,50]]
    rows = (
        [("a", "p")] * 30 + [("a", "q")] * 10
        + [("b", "p")] * 10 + [("b", "q")] * 50
    )
    df = spark.createDataFrame(rows, "a string, b string")
    n = 100.0
    want = sum(
        (o / n) * math.log((o / n) / (rx / n * cy / n))
        for o, rx, cy in [(30, 40, 40), (10, 40, 60), (10, 60, 40), (50, 60, 60)]
    )
    got = mutual_information(df, "a", "b").collect()[0]["mi_nats"]
    assert abs(got - want) < 1e-4


def test_quantile_normalize_aligns_group_distributions(spark):
    import numpy as np

    from tabata_spark.operators.stats import quantile_normalize

    rng = np.random.RandomState(5)
    # group a ~ N(0,1), group b ~ N(5,3): wildly different scales
    rows = [("a", i, float(rng.randn())) for i in range(500)] + [
        ("b", 1000 + i, float(5 + 3 * rng.randn())) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = quantile_normalize(df, "v", "g", "id", n_grid=50).toPandas()
    qa = np.sort(out[out.g == "a"].q_value.values)
    qb = np.sort(out[out.g == "b"].q_value.values)
    # after normalization both groups live on the SAME reference grid
    assert set(out[out.g == "a"].q_value) == set(out[out.g == "b"].q_value)
    assert abs(qa.mean() - qb.mean()) < 1e-9
    # rank order within each group is preserved
    a = out[out.g == "a"].sort_values("v")
    assert (a.q_value.values == np.sort(a.q_value.values)).all()


def test_theilsen_recovers_slope_under_outliers(spark):
    import numpy as np

    from tabata_spark.operators.stats import theilsen_slope

    rng = np.random.RandomState(9)
    vals = [2.5 * i + 3.0 + 0.01 * rng.randn() for i in range(300)]
    for i in range(0, 300, 23):  # ~13 gross outliers
        vals[i] += 500.0
    rows = [("r1", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "record_id string, seq long, value double")
    row = theilsen_slope(df, n_pairs=64).collect()[0]
    assert row["n"] == 300
    # OLS would be wrecked by the +500 spikes; the slope median holds
    assert abs(row["ts_slope"] - 2.5) < 0.25
    # determinism: bit-identical on re-run
    again = theilsen_slope(df, n_pairs=64).collect()[0]
    assert again["ts_slope"] == row["ts_slope"]


def test_dp_release_counts_python_replay_and_suppression(spark):
    """The DP count release is a pure function of (group key, salt):
    a hashlib replay of the md5-uniform -> geometric inverse-CDF
    chain must predict every noisy count exactly, and a high
    threshold must suppress exactly the groups the replay says."""
    import hashlib

    from tabata_spark.operators.stats import (
        _DENOM,
        dp_release_counts,
        geometric_cdf,
    )

    rows = (
        [("big", i) for i in range(100)]
        + [("mid", i) for i in range(12)]
        + [("tiny", 0)]
    )
    df = spark.createDataFrame(rows, "grp string, x long")
    cdf = geometric_cdf(math.exp(-1.0))

    def replay(key: str, n: int) -> int:
        # the self-delimiting group-key encoding: v<len>:<value>
        enc = f"v{len(key)}:{key}"
        h = hashlib.md5(f"dp:0:{enc}".encode()).hexdigest()
        gs = []
        for start in (0, 16):
            u = (int(h[start : start + 15], 16) + 1.0) / _DENOM
            gs.append(next((k for k, c in enumerate(cdf) if u < c), len(cdf)))
        return n + gs[0] - gs[1]

    expected = {"big": replay("big", 100), "mid": replay("mid", 12),
                "tiny": replay("tiny", 1)}

    got = {
        r["grp"]: r["noisy_count"]
        for r in dp_release_counts(df, ["grp"], threshold=-10**6).collect()
    }
    assert got == expected

    # threshold suppression matches the replayed noisy counts
    tau = 10
    released = {
        r["grp"]
        for r in dp_release_counts(df, ["grp"], threshold=tau).collect()
    }
    assert released == {g for g, v in expected.items() if v >= tau}

    # the xxhash64 production path: same schema, same groups released
    # under no threshold, noise still integer-bounded by the CDF tail
    prod = dp_release_counts(
        df, ["grp"], threshold=-10**6, hasher="xxhash64"
    ).collect()
    assert {r["grp"] for r in prod} == set(expected)
    assert all(
        abs(r["noisy_count"] - n0) <= 2 * len(cdf)
        for r, n0 in ((r, {"big": 100, "mid": 12, "tiny": 1}[r["grp"]])
                      for r in prod)
    )


def test_dp_release_key_encoding_no_collisions_and_null(spark):
    """The noise key is self-delimiting: group tuples ('a:b','c') and
    ('a','b:c') — identical under a naive ':'-join — must draw
    DIFFERENT noise, and a NULL group value must get deterministic
    noise (the 'n:' sentinel) instead of being dropped from the key."""
    from tabata_spark.operators.stats import dp_release_counts

    import hashlib

    from tabata_spark.operators.stats import _DENOM, geometric_cdf

    rows = [("a:b", "c")] * 50 + [("a", "b:c")] * 50 + [(None, "z")] * 50
    df = spark.createDataFrame(rows, "g1 string, g2 string")
    out = {
        (r["g1"], r["g2"]): r["noisy_count"]
        for r in dp_release_counts(
            df, ["g1", "g2"], threshold=-10**6
        ).collect()
    }
    assert len(out) == 3  # NULL group released, not skipped

    cdf = geometric_cdf(math.exp(-1.0))

    def enc(v):
        return "n:" if v is None else f"v{len(v)}:{v}"

    def replay(g1, g2, n=50):
        h = hashlib.md5(f"dp:0:{enc(g1)}{enc(g2)}".encode()).hexdigest()
        gs = []
        for start in (0, 16):
            u = (int(h[start : start + 15], 16) + 1.0) / _DENOM
            gs.append(next((k for k, c in enumerate(cdf) if u < c), len(cdf)))
        return n + gs[0] - gs[1]

    # exact replay under the self-delimiting encoding — including the
    # NULL sentinel; the two ':'-join-colliding tuples hash DIFFERENT
    # key strings ('v3:a:bv1:c' vs 'v1:av3:b:c') even when the drawn
    # noise coincides
    assert out == {k: replay(*k) for k in out}
    assert enc("a:b") + enc("c") != enc("a") + enc("b:c")


def test_geometric_cdf_epsilon_floor():
    """Below the supported noise scale the truncated inverse CDF
    would silently clip the geometric tail — it must refuse instead
    (ADVICE r14: the 201-arm cap must not weaken the stated ε-DP
    guarantee while parity still holds)."""
    import pytest as _pytest

    from tabata_spark.operators.stats import geometric_cdf

    # supported: epsilon 1.0 and the documented floor region
    assert geometric_cdf(math.exp(-1.0))[-1] > 1 - 1e-14
    assert geometric_cdf(math.exp(-0.18))[-1] > 1 - 1e-14
    with _pytest.raises(ValueError, match="epsilon"):
        geometric_cdf(math.exp(-0.01))


def test_dp_budget_composition():
    """k distinct-salt releases compose to k*eps; same-(salt, eps)
    re-release is a bit-identical replay and spends eps once; the
    same salt at a different eps is charged as a fresh release."""
    from tabata_spark.operators.stats import dp_budget

    assert dp_budget([]) == 0.0
    assert dp_budget([("s1", 1.0)]) == 1.0
    assert dp_budget([("s1", 1.0), ("s1", 1.0), ("s1", 1.0)]) == 1.0
    assert dp_budget([("s1", 1.0), ("s2", 1.0), ("s3", 1.0)]) == 3.0
    assert dp_budget([("s1", 1.0), ("s2", 0.5)]) == 1.5
    # same salt, different epsilon: conservative fresh charge
    assert dp_budget([("s1", 1.0), ("s1", 0.5)]) == 1.5


def test_dp_budget_release_identity():
    """ADVICE r15: two DIFFERENT releases (different table/grouping)
    under the same default (salt, epsilon) must each be charged — the
    dedup key includes the release identity; 2-tuples remain accepted
    for the never-reuse-a-salt caller and normalize to one identity."""
    from tabata_spark.operators.stats import dp_budget

    # distinct releases under the same default salt+eps: both charged
    assert dp_budget(
        [("dp", 1.0, "documents:source"), ("dp", 1.0, "documents:lang")]
    ) == 2.0
    # a true replay (same release id) is charged once
    assert dp_budget(
        [("dp", 1.0, "documents:source"), ("dp", 1.0, "documents:source")]
    ) == 1.0
    # mixed forms compose; the 2-tuple normalizes to release_id=""
    assert dp_budget([("dp", 1.0), ("dp", 1.0, "")]) == 1.0
    assert dp_budget([("dp", 1.0), ("dp", 1.0, "documents:lang")]) == 2.0
