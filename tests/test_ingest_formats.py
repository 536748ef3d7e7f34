"""Source-format coverage: the corpus tables round-trip through every
format Spark ships a native reader for (parquet is the store default;
JSONL/CSV/ORC are the interchange paths a pipeline ingests from)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)


def _rows(df):
    return sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.collect()
    )


def test_jsonl_roundtrip(spark, docs, tmp_path):
    p = str(tmp_path / "docs_jsonl")
    docs.write.json(p)
    back = spark.read.schema(docs.schema).json(p)
    assert _rows(back) == _rows(docs)


def test_orc_roundtrip(spark, docs, tmp_path):
    p = str(tmp_path / "docs_orc")
    docs.write.orc(p)
    assert _rows(spark.read.orc(p)) == _rows(docs)


def test_csv_roundtrip(spark, docs, tmp_path):
    p = str(tmp_path / "docs_csv")
    # quote-escape free-text safely; header carries names, explicit
    # schema carries types (inference would widen ids to strings)
    docs.write.option("header", "true").option("escape", '"').csv(p)
    back = spark.read.options(header="true", escape='"').schema(docs.schema).csv(p)
    assert _rows(back) == _rows(docs)
