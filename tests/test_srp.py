"""SRP / Johnson-Lindenstrauss projection: numpy parity, determinism,
and the distance-preservation property at a dimension where JL bites."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tabata_spark.operators.similarity import srp_project, srp_signs


def test_signs_are_deterministic_and_rademacher():
    a = srp_signs(64, 8, "srp")
    b = srp_signs(64, 8, "srp")
    assert a == b
    flat = [s for row in a for s in row]
    assert set(flat) == {1.0, -1.0}
    # md5-derived: roughly balanced
    assert 0.35 < (sum(1 for s in flat if s > 0) / len(flat)) < 0.65


def test_projection_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((20, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    signs = srp_signs(16, 4, "t")
    out = srp_project(df, signs).orderBy("vec_id").collect()
    S = np.asarray(signs)  # (4, 16)
    expected = (vecs.astype(np.float64) @ S.T) / math.sqrt(4)
    got = np.asarray([[r[f"p{j}"] for j in range(4)] for r in out])
    assert np.allclose(got, expected, atol=1e-9)


def test_jl_preserves_pairwise_distances(spark):
    # 256 -> 64 dims: JL says pairwise L2 distances are preserved
    # within a modest epsilon with high probability for a fixed
    # deterministic Rademacher matrix and random data.
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((30, 256))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    signs = srp_signs(256, 64, "jl")
    rows = srp_project(df, signs).orderBy("vec_id").collect()
    proj = np.asarray([[r[f"p{j}"] for j in range(64)] for r in rows])
    ratios = []
    for i in range(0, 30, 3):
        for j in range(1, 30, 7):
            if i == j:
                continue
            d0 = np.linalg.norm(vecs[i] - vecs[j])
            d1 = np.linalg.norm(proj[i] - proj[j])
            ratios.append(d1 / d0)
    assert 0.6 < min(ratios) and max(ratios) < 1.4
    assert abs(float(np.mean(ratios)) - 1.0) < 0.12
