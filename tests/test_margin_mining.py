"""Margin-based bitext mining (similarity.margin_mining): pandas
reference parity on random vectors + the hub-suppression property the
margin exists for."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from tabata_spark.operators.similarity import margin_mining


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )


def _reference(svecs, tvecs, k):
    """Row-at-a-time margin replay (same rounding discipline: shifted
    [0,1] similarities, clamped denominator)."""
    cos = {}
    for si, sv in svecs:
        for ti, tv in tvecs:
            c = float(np.dot(sv, tv) / (np.linalg.norm(sv) * np.linalg.norm(tv)))
            cos[(si, ti)] = round(c, 4)
    sim = {key: round((1.0 + c) / 2.0, 6) for key, c in cos.items()}
    ms = {}
    for si, _ in svecs:
        tops = sorted(
            ((cos[(si, ti)], ti) for ti, _ in tvecs), key=lambda x: (-x[0], x[1])
        )[:k]
        ms[si] = sum(sim[(si, ti)] for _, ti in tops) / len(tops)
    mt = {}
    for ti, _ in tvecs:
        tops = sorted(
            ((cos[(si, ti)], si) for si, _ in svecs), key=lambda x: (-x[0], x[1])
        )[:k]
        mt[ti] = sum(sim[(si, ti)] for _, si in tops) / len(tops)
    return {
        (si, ti): round(sim[(si, ti)] / max((ms[si] + mt[ti]) / 2.0, 1e-6), 4)
        for (si, ti) in cos
    }


def test_margin_matches_reference(spark):
    rng = np.random.RandomState(11)
    svecs = [(i, rng.randn(8)) for i in range(0, 12, 2)]
    tvecs = [(i, rng.randn(8)) for i in range(1, 31, 2)]
    got = {
        (r["src_id"], r["tgt_id"]): r["margin"]
        for r in margin_mining(
            _emb_df(spark, svecs), _emb_df(spark, tvecs), k=4
        ).collect()
    }
    want = _reference(svecs, tvecs, 4)
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) <= 1e-4, key


def test_margin_suppresses_hub_vectors(spark):
    # y_hub is moderately close to EVERY src; y_match aligns with one.
    # Raw cosine can prefer the hub; the margin must prefer the
    # genuine mutual match — that is the operator's entire point.
    svecs = [(0, [1.0, 0.0]), (2, [0.0, 1.0]), (4, [0.7, 0.7])]
    tvecs = [(1, [1.0, 0.0]), (3, [0.75, 0.66])]
    out = margin_mining(
        _emb_df(spark, svecs), _emb_df(spark, tvecs), k=2
    ).collect()
    best = max(out, key=lambda r: (r["margin"], -r["src_id"]))
    assert (best["src_id"], best["tgt_id"]) == (0, 1)


def test_margin_sane_for_anticorrelated_source(spark):
    # Review finding r7 pass 2: raw-cosine neighborhood means go
    # negative here and flipped the ratio's sign — the most DISSIMILAR
    # pair won. With shifted similarities the best pair must be the
    # least-negative one, and all margins stay finite and positive.
    svecs = [(0, [1.0, 0.0])]
    tvecs = [(1, [-1.0, 0.0]), (3, [-0.9, -0.1])]
    out = margin_mining(_emb_df(spark, svecs), _emb_df(spark, tvecs), k=2).collect()
    by_tgt = {r["tgt_id"]: r for r in out}
    assert all(r["margin"] is not None and r["margin"] >= 0 for r in out)
    assert by_tgt[3]["margin"] > by_tgt[1]["margin"]  # -0.99 beats -1.0
