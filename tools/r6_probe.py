"""Scale probes for the round-6 operators: temperature mixture,
Pareto quality gate, and quality-classifier train/score. Distributed
generation, inputs materialized to Parquet before timing:

    python tools/r6_probe.py [n_docs]

Prints one JSON line with per-stage seconds and sanity counters.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from pyspark.sql import functions as F

    from tabata_spark.ml.textclf import (
        keep_top_quality,
        score_quality,
        train_quality_classifier,
    )
    from tabata_spark.operators.sampling import (
        mixture_temperature,
        pareto_quality_sample,
    )
    from tabata_spark.session import get_spark

    spark = get_spark("r6-probe")
    out: dict[str, float | int] = {"n_docs": n_docs}
    tmp = tempfile.mkdtemp(prefix="r6_probe_")

    def force(df):
        return df.agg(F.sum(F.hash(*df.columns))).collect()

    # -------- corpus: zipf-ish 20-language skew (lang0 ~ half the
    # corpus), ~30 tokens/doc, a planted 'seed'-vocab slice for the
    # classifier to learn
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    lang = F.concat(
        F.lit("lang"),
        F.floor(F.log2(F.pmod(F.xxhash64("doc_id", F.lit("L")), F.lit(1 << 20)) + 1)).cast("int"),
    )
    tok = lambda i, p: F.concat(
        F.lit(p), F.pmod(F.xxhash64("doc_id", F.lit(i)), F.lit(50_000))
    )
    is_seed = F.pmod(F.xxhash64("doc_id", F.lit("S")), F.lit(10)) < 3
    body = [tok(i, "w") for i in range(24)]
    seedtoks = [tok(i, "q") for i in range(6)]
    docs = ids.select(
        "doc_id",
        lang.alias("lang"),
        is_seed.cast("double").alias("label"),
        F.when(is_seed, F.concat_ws(" ", *(body + seedtoks)))
        .otherwise(F.concat_ws(" ", *body, *[tok(i + 30, "w") for i in range(6)]))
        .alias("text"),
        (F.pmod(F.xxhash64("doc_id", F.lit("Q")), F.lit(1000)) / 1000.0).alias(
            "score"
        ),
    )
    dpath = os.path.join(tmp, "docs")
    docs.write.mode("overwrite").parquet(dpath)
    docs = spark.read.parquet(dpath)

    # -------- temperature mixture over the skewed lang distribution
    t0 = time.perf_counter()
    kept = mixture_temperature(docs, "lang", alpha=0.7)
    out["mixture_temp_rows"] = kept.count()
    out["mixture_temp_s"] = round(time.perf_counter() - t0, 2)

    # -------- Pareto gate on the uniform score column
    t0 = time.perf_counter()
    out["pareto_rows"] = pareto_quality_sample(docs, "score").count()
    out["pareto_s"] = round(time.perf_counter() - t0, 2)

    # -------- classifier: fit on a 2% slice, score the full corpus
    train = docs.filter(F.pmod(F.xxhash64("doc_id", F.lit("T")), F.lit(50)) == 0)
    t0 = time.perf_counter()
    model = train_quality_classifier(train, n_features=1 << 18, max_iter=20)
    out["clf_fit_s"] = round(time.perf_counter() - t0, 2)
    out["clf_train_rows"] = train.count()

    t0 = time.perf_counter()
    force(score_quality(model, docs))
    out["clf_score_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["clf_keep_rows"] = keep_top_quality(model, docs, fraction=0.3).count()
    out["clf_gate_s"] = round(time.perf_counter() - t0, 2)

    # -------- signal ops at 10M samples across 10k records
    from tabata_spark.operators.asof import fill_forward
    from tabata_spark.operators.ewma import ewma

    n_sig = 10_000_000
    sig = spark.range(n_sig).select(
        F.pmod(F.col("id"), F.lit(10_000)).alias("record_id"),
        (F.col("id") / 10_000).cast("long").alias("seq"),
        F.when(
            F.pmod(F.xxhash64("id"), F.lit(7)) == 0, F.lit(None)
        )
        .otherwise((F.pmod(F.xxhash64("id", F.lit("v")), F.lit(1000)) / 10.0))
        .alias("value"),
    )
    spath = os.path.join(tmp, "sig")
    sig.write.mode("overwrite").parquet(spath)
    sig = spark.read.parquet(spath)
    out["n_sig"] = n_sig

    t0 = time.perf_counter()
    force(ewma(sig, alpha=0.2, lookback=32).select("record_id", "seq", "ewma"))
    out["ewma_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    force(fill_forward(sig, ["value"], back=True).select("record_id", "seq", "value"))
    out["gapfill_s"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
