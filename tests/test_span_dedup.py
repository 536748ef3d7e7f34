"""Exact substring-span dedup (duplicated token n-grams).

Crafted corpora with planted spans; properties checked:
- a span copied across docs is detected with exact coverage,
- union-of-intervals math is right for overlapping / adjacent /
  disjoint duplicated n-grams,
- docs shorter than n emit nothing and survive with zero coverage,
- hash and text keys agree (no collisions at this size),
- strip keeps the globally-first occurrence and reassembles in order,
- within-doc repetition counts as duplication.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tabata_spark.operators.dedup import (
    duplicate_span_stats,
    ngram_positions,
    strip_duplicate_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_planted_cross_doc_span(spark):
    # a 10-token span shared between doc0 and doc1 -> with n=4 the
    # duplicated 4-gram starts cover exactly those 10 tokens in each
    span = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    docs = _docs(
        spark,
        [
            f"a1 a2 a3 {span} a4 a5",
            f"b1 {span} b2 b3 b4 b5 b6",
            "c1 c2 c3 c4 c5 c6 c7 c8 c9",
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in duplicate_span_stats(docs, n=4).collect()
    }
    assert out[0]["covered_tokens"] == 10
    assert out[1]["covered_tokens"] == 10
    assert out[2]["covered_tokens"] == 0
    # starts: positions where a duplicated 4-gram begins = 10-4+1 = 7
    assert out[0]["dup_starts"] == 7
    assert out[0]["n_tokens"] == 15


def test_short_docs_emit_nothing(spark):
    docs = _docs(spark, ["a b c", "a b c", "x"])
    assert ngram_positions(docs, n=4).count() == 0
    out = {r["doc_id"]: r for r in duplicate_span_stats(docs, n=4).collect()}
    assert len(out) == 3
    assert all(r["covered_tokens"] == 0 for r in out.values())


def test_union_of_intervals_disjoint_and_overlap(spark):
    # doc2 contains two copies of a 4-gram: within-doc duplication.
    # doc0: same 4-gram once at pos 1 and once at pos 7 (disjoint),
    # doc1: overlapping duplicated grams via a 5-token shared span.
    docs = _docs(
        spark,
        [
            "p q r s x y p q r s z",  # dup grams: 'p q r s' @1,@7; 'q r s x' @2
            "m p q r s x n o u v w",  # shares 'p q r s' @2 and 'q r s x' @3
            "p q r s o o o o o o o",  # 'p q r s' @1; 'o o o o' @5..8 (4 starts)
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in duplicate_span_stats(docs, n=4).collect()}
    # doc0 union: [1,5)∪[2,6)∪[7,11) -> 5 + 4 = 9 covered, 3 starts
    assert out[0]["covered_tokens"] == 9
    assert out[0]["dup_starts"] == 3
    # doc1 union: [2,6)∪[3,7) -> 5 covered, 2 starts
    assert out[1]["covered_tokens"] == 5
    assert out[1]["dup_starts"] == 2
    # doc2: 'o o o o' occurs 4x within-doc -> covers pos 5..11 (7)
    # plus 'p q r s' covers 1..4 -> 11 total
    assert out[2]["covered_tokens"] == 11


def test_hash_and_text_keys_agree(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    a = duplicate_span_stats(docs, n=8, key="hash").orderBy("doc_id").collect()
    b = duplicate_span_stats(docs, n=8, key="text").orderBy("doc_id").collect()
    assert a == b


def test_strip_keeps_first_occurrence(spark):
    span = "s1 s2 s3 s4 s5"
    docs = _docs(
        spark,
        [
            f"a1 {span} a2",  # first occurrence (min doc_id) -> kept intact
            f"b1 b2 {span} b3",  # copy -> span removed
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in strip_duplicate_spans(docs, n=5).collect()}
    assert out[0]["n_removed"] == 0
    assert out[0]["kept_text"] == f"a1 {span} a2"
    assert out[1]["n_removed"] == 5
    assert out[1]["kept_text"] == "b1 b2 b3"


def test_strip_within_doc_repeat(spark):
    # the SECOND within-doc copy is removed, first kept
    docs = _docs(spark, ["k1 k2 k3 k4 z1 z2 k1 k2 k3 k4"])
    out = strip_duplicate_spans(docs, n=4).collect()[0]
    assert out["n_removed"] == 4
    assert out["kept_text"] == "k1 k2 k3 k4 z1 z2"


def test_strip_plan_has_no_token_explode(spark, sf_dir):
    # the doc-table side filters tokens in place: the only explode in
    # the plan feeds the n-gram/coverage side, and the final projection
    # is an array filter — assert no Generate sits above the final join
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    plan = strip_duplicate_spans(docs, n=8)._jdf.queryExecution().optimizedPlan().toString()
    # every Generate in the plan belongs to the coverage side (n-gram
    # transform or interval sequence); a bare explode of the token
    # split — the shape reassembly-by-token-explode would add — must
    # not appear
    gens = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gens, "expected coverage-side explodes"
    assert all("sequence" in ln for ln in gens), plan
