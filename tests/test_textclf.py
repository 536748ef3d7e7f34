"""Quality classifier (ml/textclf.py): learns a known separation,
scores deterministically, persists, and stays scan-stage at scoring
time (no shuffle in the score plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabata_spark.ml.textclf import (
    keep_top_quality,
    score_quality,
    train_quality_classifier,
)
from tabata_spark.operators.sampling import hash_split

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _labeled(docs):
    # Seed-vs-crawl proxy with a RECOVERABLE token signal: the testdata
    # corpus shares one vocabulary across every lang/source (the labels
    # are metadata-only), so the learnable ground truth is a token
    # membership — the classifier must find the 'spark'-bearing hashed
    # feature among 2^15 and weight it up from data alone.
    return docs.withColumn(
        "label",
        F.array_contains(F.split("text", " ", -1), "spark").cast("double"),
    )


@pytest.fixture(scope="module")
def model(docs):
    train = hash_split(_labeled(docs), salt="clf").filter(
        F.col("split") == "train"
    )
    return train_quality_classifier(
        train, n_features=1 << 15, max_iter=50, reg_param=1e-4
    )


def test_learns_the_separation(docs, model):
    test = hash_split(_labeled(docs), salt="clf").filter(F.col("split") == "test")
    scored = score_quality(model, test).join(
        test.select("doc_id", "label"), "doc_id"
    )
    agg = scored.agg(
        F.avg(F.when(F.col("label") == 1.0, F.col("quality_prob"))).alias("p_pos"),
        F.avg(F.when(F.col("label") == 0.0, F.col("quality_prob"))).alias("p_neg"),
        F.avg(
            ((F.col("quality_prob") > 0.5) == (F.col("label") == 1.0)).cast("double")
        ).alias("acc"),
    ).collect()[0]
    # held-out: English pages score far above non-English
    assert agg["p_pos"] > 0.8
    assert agg["p_neg"] < 0.2
    assert agg["acc"] > 0.9


def test_scoring_is_deterministic(docs, model):
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, docs).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, docs).collect()}
    assert a == b
    assert len(a) == docs.count()


def test_score_plan_is_scan_stage(docs, model):
    # The corpus score pass must not shuffle: the model is a broadcast
    # coefficient vector applied in the scan stage.
    plan = score_quality(model, docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_keep_top_quality_fraction(docs, model):
    kept = keep_top_quality(model, docs, fraction=0.4)
    n, k = docs.count(), kept.count()
    # approx quantile + tie-keeping: within a loose band of the target
    assert 0.25 * n <= k <= 0.55 * n
    # kept docs carry the score column for downstream Pareto sampling
    assert "quality_prob" in kept.columns


def test_model_round_trips(tmp_path, docs, model):
    from pyspark.ml import PipelineModel

    path = str(tmp_path / "qclf")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, docs).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(loaded, docs).collect()}
    assert a == b
