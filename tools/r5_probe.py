"""Round-5 operator scale probe: DSIR weights, Gopher rules,
tokenizer fertility, length-grouped batching on a 1M-doc synthetic
corpus, and SemDeDup on 200k synthetic embeddings with planted
copies. Distributed generation (no driver data), measured AFTER
materializing to Parquet:

    python tools/r5_probe.py [n_docs] [n_vecs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from pyspark.sql import functions as F

    from tabata_spark.operators.packing import length_grouped_batches
    from tabata_spark.operators.sampling import dsir_weights
    from tabata_spark.operators.similarity import semantic_dedup
    from tabata_spark.operators.text import gopher_rules
    from tabata_spark.session import get_spark

    spark = get_spark("r5-probe")
    out: dict[str, float | int] = {"n_docs": n_docs, "n_vecs": n_vecs}
    tmp = tempfile.mkdtemp(prefix="r5_probe_")

    # -------- corpus: ~40 tokens/doc, every 10th doc 'target' domain
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    tok = lambda i: F.concat(
        F.lit("w"), F.pmod(F.xxhash64("doc_id", F.lit(i)), F.lit(30_000))
    )
    docs = ids.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, "en").otherwise("other").alias("lang"),
        F.concat(F.lit("src"), F.pmod("doc_id", F.lit(5))).alias("source"),
        F.concat_ws(" ", *[tok(i) for i in range(40)]).alias("text"),
    )
    dpath = os.path.join(tmp, "docs")
    t0 = time.perf_counter()
    docs.write.mode("overwrite").parquet(dpath)
    out["gen_docs_s"] = round(time.perf_counter() - t0, 2)
    docs = spark.read.parquet(dpath)

    def probe(name, frame):
        t = time.perf_counter()
        n = frame.count()
        out[name] = round(time.perf_counter() - t, 2)
        print(f"# {name}: {out[name]}s ({n} rows)", file=sys.stderr)

    probe("dsir_weights", dsir_weights(docs, F.col("lang") == "en"))
    rules = gopher_rules("text", min_words=10)
    probe(
        "gopher_rules",
        docs.select("doc_id", *[c.alias(k) for k, c in rules.items()]).filter(
            F.col("r_word_count") & F.col("r_alpha_words")
        ),
    )
    fert = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ", -1))).alias("n_words"),
        F.sum(F.octet_length("text")).alias("n_bytes"),
    )
    probe("fertility_agg", fert)
    probe("length_batches", length_grouped_batches(docs, batch_size=64))

    # -------- embeddings: dim 32, every 20th vector an exact copy of
    # its group head (planted semantic dups), 64 fixed-id seeds
    dim = 32
    vids = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    base = F.when(
        F.col("vec_id") % 20 == 0, (F.col("vec_id") / 40).cast("long") * 40 + 1
    ).otherwise(F.col("vec_id"))
    vec = F.array(
        *[
            (
                F.pmod(F.xxhash64(F.col("__b"), F.lit(d)), F.lit(2000)).cast(
                    "double"
                )
                / 1000.0
                - 1.0
            )
            for d in range(dim)
        ]
    )
    emb = vids.withColumn("__b", base).select("vec_id", vec.alias("embedding"))
    epath = os.path.join(tmp, "emb")
    t0 = time.perf_counter()
    emb.write.mode("overwrite").parquet(epath)
    out["gen_emb_s"] = round(time.perf_counter() - t0, 2)
    emb = spark.read.parquet(epath)

    seeds = [
        list(map(float, r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 128).orderBy("vec_id").collect()
    ]
    from tabata_spark.operators.similarity import semantic_dedup_blocked

    for name, fn in (
        ("semantic_dedup", lambda: semantic_dedup(emb, seeds, threshold=0.95)),
        (
            "semantic_dedup_blocked",
            lambda: semantic_dedup_blocked(
                emb, seeds, threshold=0.95, block_size=1024
            ),
        ),
    ):
        t0 = time.perf_counter()
        dropped = fn().filter(~F.col("keep")).count()
        out[f"{name}_s"] = round(time.perf_counter() - t0, 2)
        out[f"{name}_dropped"] = dropped
        print(
            f"# {name}: {out[f'{name}_s']}s ({dropped} dropped)",
            file=sys.stderr,
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
