"""Scale probes for the round-6 session-2 operator families —
fixed-point PageRank, eval-set decontamination, and the sketch layer
(CMS / Bloom / DDSketch / dataset fingerprint) — at 10-20M-row
volumes, an order of magnitude past the battery's sf0.1 inputs.
Inputs are generated distributed (spark.range + hash-derived
columns) and materialized to Parquet BEFORE timing.

    python tools/r6b_probe.py [n_edges] [n_docs]

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
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    from pyspark.sql import functions as F

    from tabata_spark.operators.graph import pagerank
    from tabata_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
        cms_build,
        ddsketch_build,
        ddsketch_quantiles,
    )
    from tabata_spark.operators.text import decontaminate
    from tabata_spark.session import get_spark

    spark = get_spark("r6b-probe")
    out: dict[str, float | int] = {"n_edges": n_edges, "n_docs": n_docs}
    tmp = tempfile.mkdtemp(prefix="r6b_probe_")

    # ---- graph: 1M nodes, n_edges base rows, symmetrized ----
    n_nodes = 1_000_000
    base = spark.range(n_edges).select(
        (F.col("id") % n_nodes).cast("string").alias("src"),
        ((F.col("id") * 2654435761) % n_nodes).cast("string").alias("dst"),
    )
    epath = os.path.join(tmp, "edges")
    base.unionAll(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).write.parquet(epath)
    edges = spark.read.parquet(epath)
    t0 = time.time()
    pr = pagerank(edges, iterations=5, checkpoint_every=1)
    out["pagerank_rows"] = pr.count()
    out["pagerank_s"] = round(time.time() - t0, 2)

    # ---- docs: hash-derived 40-token texts ----
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.substring(
            F.md5(F.concat_ws(":", (F.col("id") % 50000).cast("string"), i.cast("string"))),
            1,
            6,
        ),
    )
    dpath = os.path.join(tmp, "docs")
    spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    ).write.parquet(dpath)
    docs = spark.read.parquet(dpath)
    t0 = time.time()
    # 97 is coprime with the 50000-doc template period, so eval
    # templates spread across the corpus and template-duplicate train
    # docs genuinely hit (a % 100 split aligns with the period and
    # proves nothing: every same-template doc of an eval doc IS eval)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    d = decontaminate(train, ev, ngram=8)
    out["decontam_flagged"] = d.filter("contaminated").count()
    out["decontam_s"] = round(time.time() - t0, 2)

    # ---- sketches over the token stream / key stream ----
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    t0 = time.time()
    out["cms_rows"] = cms_build(toks, "tok", depth=4, width=2048).count()
    out["cms_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["cms_prod_rows"] = cms_build(
        toks, "tok", depth=4, width=2048, hasher="xxhash64"
    ).count()
    out["cms_prod_s"] = round(time.time() - t0, 2)

    keys = spark.range(5_000_000).select(F.col("id").alias("k"))
    t0 = time.time()
    bloom = bloom_build(keys.filter("k % 2 = 0"), "k", m_bits=1 << 24, k=5)
    probe = bloom_might_contain(
        bloom, keys.sample(0.01, seed=7), "k", m_bits=1 << 24, k=5
    )
    out["bloom_hits"] = probe.filter("might_contain").count()
    out["bloom_s"] = round(time.time() - t0, 2)

    vals = spark.range(20_000_000).select(
        ((F.col("id") % 97321) / 100.0 + 0.01).alias("v")
    )
    t0 = time.time()
    sk = ddsketch_build(vals, "v")
    q = ddsketch_quantiles(sk, [0.5, 0.99]).collect()[0]
    out["dd_p50"] = round(q["p50"], 2)
    out["dd_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    fp = (
        docs.select(
            F.conv(
                F.substring(F.md5(F.concat_ws("|", "doc_id", "text")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("hv")
        )
        .agg(
            F.pmod(
                F.sum(F.col("hv").cast("decimal(38,0)")),
                F.lit(1152921504606846976).cast("decimal(38,0)"),
            ).cast("long")
        )
        .collect()[0][0]
    )
    out["fingerprint"] = int(fp)
    out["fingerprint_s"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
