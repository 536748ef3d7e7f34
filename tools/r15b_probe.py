"""Round-15b scale probe: band-sequential LSH candidate generation.

The r15 sharded-verify A/B re-attributed the 20M-doc dedup
pipeline's spill-bound stage: 907.6 s of the 1108 s "pairs" wall is
CANDIDATE generation (shingle explode -> signature aggregation ->
banded bucket aggregation), not the exact-Jaccard verify. This probe
measures the flat-memory answer for THAT stage: persist the signature
table once, then run the banded bucket aggregation either over all 16
bands in one job (mono — what minhash_candidates does) or as G
sequential band groups, each shuffling 1/G of the banded rows.
Per-group candidate outputs are tiny (<1M rows) and are persisted, so
the final cross-group distinct is cheap; the distinct pair count must
equal mono's exactly (the same (band, bucket) set is aggregated, just
in G passes).

    python tools/r15b_probe.py [n_docs] [mode] [G] [dir]
      mode: prep | cand-mono | cand-banded

As with r15_probe, run modes as separate processes so each variant's
peak RSS is its own. Corpus shape identical to tools/r14_probe.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from r14_probe import PeakRss  # noqa: E402

BANDS, ROWS, CAP = 16, 2, 50


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "prep"
    n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    work_dir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/r15b_work"
    assert mode in ("prep", "cand-mono", "cand-banded"), mode

    from pyspark.sql import functions as F

    from tabata_spark.operators.dedup import (
        _band_hash_array,
        bucket_candidate_pairs,
        minhash_signatures_from_shingles,
        token_shingles,
    )
    from tabata_spark.session import get_spark

    spark = get_spark("r15b-" + mode)
    out: dict = {"n_docs": n_docs, "mode": mode}

    if mode == "prep":
        # corpus (r14_probe shape, dup_rate 0.05) -> signature table
        ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
        base = F.when(
            F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(1_000_000)) < 50_000,
            (F.col("doc_id") / 4).cast("long") * 4,
        ).otherwise(F.col("doc_id"))
        tok = lambda i: F.concat(  # noqa: E731
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("__base"), F.lit(i)), F.lit(50_000)),
        )
        suf = lambda i: F.concat(  # noqa: E731
            F.lit("s"),
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(100 + i)), F.lit(50_000)),
        )
        n_suffix = F.pmod(F.col("doc_id"), F.lit(3))
        corpus = ids.withColumn("__base", base).select(
            "doc_id",
            F.concat_ws(
                " ",
                F.array(*[tok(i) for i in range(40)]),
                F.slice(F.array(*[suf(i) for i in range(2)]), F.lit(1), n_suffix),
            ).alias("text"),
        )
        sh = corpus.select(
            F.col("doc_id").alias("id"),
            F.explode(token_shingles(F.col("text"), 3)).alias("sh"),
        )
        sig = minhash_signatures_from_shingles(sh, id_col="id", num_hashes=32)
        with PeakRss() as rss:
            t0 = time.perf_counter()
            sig.write.mode("overwrite").parquet(os.path.join(work_dir, "sig"))
            out["sig_build_write_s"] = round(time.perf_counter() - t0, 2)
        out["peak_rss_mib"] = round(rss.peak_mib, 1)
        print(json.dumps(out))
        return

    sig = spark.read.parquet(os.path.join(work_dir, "sig"))
    banded = sig.select(
        F.col("id").alias("__id"),
        F.posexplode(_band_hash_array(BANDS, ROWS)).alias("band", "bh"),
    )
    with PeakRss() as rss:
        t0 = time.perf_counter()
        if mode == "cand-mono":
            n_cand = bucket_candidate_pairs(
                banded, ["band", "bh"], "__id", max_bucket_size=CAP
            ).count()
        else:
            out["n_groups"] = n_groups
            per = BANDS // n_groups
            parts = []
            walls = []
            for g in range(n_groups):
                tg = time.perf_counter()
                p = bucket_candidate_pairs(
                    banded.filter(
                        F.col("band").between(g * per, (g + 1) * per - 1)
                    ),
                    ["band", "bh"],
                    "__id",
                    max_bucket_size=CAP,
                ).persist()
                n_g = p.count()
                parts.append(p)
                walls.append(round(time.perf_counter() - tg, 2))
                print(
                    f"# band group {g}: {walls[-1]}s ({n_g} pairs,"
                    f" rss {round(rss.peak_mib, 1)} MiB)",
                    file=sys.stderr,
                )
            out["group_walls_s"] = walls
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            n_cand = u.distinct().count()
        out["cand_s"] = round(time.perf_counter() - t0, 2)
        out["n_candidates"] = n_cand
    out["peak_rss_mib"] = round(rss.peak_mib, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
