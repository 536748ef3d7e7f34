"""Corpus quality classifier — the fastText-style filtering model
(CCNet / GPT-3 WebText-vs-CommonCrawl, LLaMA's "classify pages that
look like references") re-expressed on MLlib.

A training-data pipeline rarely has per-document quality LABELS; it
has a trusted seed corpus (wiki/books/reference pages) and a raw
crawl. The standard recipe: label seed=1 / crawl=0, train a linear
classifier over hashed token features, score the whole corpus with
the model, keep the top slice (optionally Pareto-sampled). This
module is that recipe, Spark-first:

- tokenize + HashingTF are scan-stage transforms (no vocabulary
  build, no shuffle — the feature space is a fixed hash range);
- LogisticRegression fits distributed (L-BFGS over partials);
- scoring broadcasts one coefficient vector and runs in the scan
  stage — at 100 TB the score pass is a single map over the corpus.

Not SQL-expressible (iterative optimizer), so this carries no DuckDB
oracle; correctness is pinned by tests/test_textclf.py (learns a
known separation, scores deterministically, round-trips persistence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "\\s+"


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 50,
    binary_tf: bool = True,
):
    """Fit seed-vs-crawl logistic regression over hashed unigram
    features. Returns a fitted ``pyspark.ml.PipelineModel``.

    ``n_features`` (hash range) trades collision noise for model size:
    2^18 doubles ≈ 2 MB of coefficients — broadcastable at any corpus
    size. ``binary_tf`` uses presence (not counts), the fastText
    default for short-document quality filtering.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol="__toks",
        pattern=TOKEN_PATTERN,
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="__toks",
        outputCol="__features",
        numFeatures=n_features,
        binary=binary_tf,
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_quality(
    model,
    docs: DataFrame,
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score documents with a trained classifier: (id_col, out_col)
    where out_col is P(label=1). Scan-stage: tokenize → hash →
    broadcast dot product; no shuffle, no iteration."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    return scored.select(
        F.col(id_col),
        F.element_at(vector_to_array("probability"), 2).alias(out_col),
    )


def keep_top_quality(
    model,
    docs: DataFrame,
    fraction: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Filter the corpus to the ``fraction`` highest-scoring documents.

    The cutoff is an approximate quantile of the score distribution
    (approxQuantile — one pass, mergeable sketch), then a scan-stage
    predicate: the (id, score) frame is persisted so the corpus is
    scored ONCE, not once for the quantile and again for the filter.
    Ties at the cutoff are kept (the conservative side for a quality
    gate)."""
    # persisted through the quantile action so the returned plan's
    # filter reads the cache instead of re-scoring; the 2-column frame
    # is small relative to the corpus and LRU-evicts when cold
    scores = score_quality(model, docs, id_col=id_col).persist()
    cut = scores.approxQuantile("quality_prob", [1.0 - fraction], 1e-3)[0]
    keep = scores.filter(F.col("quality_prob") >= cut).select(id_col, "quality_prob")
    return docs.join(keep, id_col)
