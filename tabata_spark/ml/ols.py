"""OLS with diagnostics (reference M10 — the exam notebook's
``smf.ols('Conso ~ Temp + Speed')`` usage, cells 62-67).

MLlib LinearRegression with the normal-equation solver exposes the
statsmodels-style summary: coefficients with standard errors,
t-statistics, p-values, R², plus prediction intervals from the
residual variance.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class OLSResult:
    target: str
    factors: list[str]
    intercept: float
    coefficients: dict[str, float] = field(default_factory=dict)
    std_errors: dict[str, float] = field(default_factory=dict)
    t_values: dict[str, float] = field(default_factory=dict)
    p_values: dict[str, float] = field(default_factory=dict)
    r2: float = float("nan")
    r2_adj: float = float("nan")
    rmse: float = float("nan")
    n: int = 0

    def summary(self) -> str:
        lines = [
            f"OLS: {self.target} ~ {' + '.join(self.factors)}",
            f"n={self.n}  R2={self.r2:.4f}  R2_adj={self.r2_adj:.4f}  RMSE={self.rmse:.4f}",
            f"{'term':<16}{'coef':>14}{'stderr':>12}{'t':>10}{'p':>10}",
        ]
        terms = ["(intercept)"] + self.factors
        for t in terms:
            c = self.intercept if t == "(intercept)" else self.coefficients[t]
            se = self.std_errors.get(t, float("nan"))
            tv = self.t_values.get(t, float("nan"))
            pv = self.p_values.get(t, float("nan"))
            lines.append(f"{t:<16}{c:>14.6g}{se:>12.4g}{tv:>10.3f}{pv:>10.4f}")
        return "\n".join(lines)


def ols(df: DataFrame, target: str, factors: list[str]) -> OLSResult:
    """Fit OLS with full diagnostics (normal solver => exact stats)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    asm = VectorAssembler(
        inputCols=factors, outputCol="features", handleInvalid="skip"
    )
    data = asm.transform(df).select("features", F.col(f"`{target}`").alias("label"))
    lr = LinearRegression(solver="normal", regParam=0.0)
    model = lr.fit(data)
    s = model.summary
    # summary orders stats as [factors..., intercept]
    ses = list(s.coefficientStandardErrors)
    ts = list(s.tValues)
    ps = list(s.pValues)
    terms = list(factors) + ["(intercept)"]
    res = OLSResult(
        target=target,
        factors=list(factors),
        intercept=float(model.intercept),
        coefficients={f: float(c) for f, c in zip(factors, model.coefficients)},
        std_errors=dict(zip(terms, map(float, ses))),
        t_values=dict(zip(terms, map(float, ts))),
        p_values=dict(zip(terms, map(float, ps))),
        r2=float(s.r2),
        r2_adj=float(s.r2adj),
        rmse=float(s.rootMeanSquaredError),
        n=int(s.numInstances),
    )
    return res


def predict_with_interval(
    df: DataFrame, res: OLSResult, alpha: float = 0.05
) -> DataFrame:
    """Prediction + large-n normal prediction-interval columns
    (pred, pred_lo, pred_hi) as inline expressions — the reference
    exam's get_prediction().summary_frame() shape (cells 65-67)."""
    from statistics import NormalDist

    z = NormalDist().inv_cdf(1 - alpha / 2)
    pred = F.lit(res.intercept)
    for c, b in res.coefficients.items():
        pred = pred + F.lit(b) * F.col(f"`{c}`")
    half = F.lit(z * res.rmse)
    return (
        df.withColumn("pred", pred)
        .withColumn("pred_lo", F.col("pred") - half)
        .withColumn("pred_hi", F.col("pred") + half)
    )
