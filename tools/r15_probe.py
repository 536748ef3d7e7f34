"""Round-15 scale probe: the sharded LSH-verify stage (VERDICT r14 #7).

The r14 20M-doc keep-best probe showed every stage sublinear EXCEPT
LSH-verify (19.1x wall for 10x docs — the candidate-join shuffle goes
spill-bound on one node). The flat-memory answer SCALE.md gestures at
is executor-count sharding: split the CANDIDATE set into K hash
slices and verify them as K sequential jobs — each pass's shuffle
working set is 1/K, so peak memory stays flat at the cost of scanning
the (persisted) shingle-array table K times. On a real cluster the
same split runs as K parallel stages over K executor groups; one node
emulates that by running them back-to-back.

Sharding is a PARTITION of the candidate set — the union of slice
outputs is set-identical to the monolithic output (asserted via the
pair count), so recall is untouched by construction.

    python tools/r15_probe.py [n_docs] [dup_rate] [mode] [K] [dir]
      mode: mono (default) | sharded | prep | verify-mono | verify-sharded

Run the modes as SEPARATE invocations: the JVM never returns heap to
the OS, so a single-process A/B would let the first mode's peak mask
the second's. In particular the candidate stage peaks ~52 GiB at 20M
docs, masking the verify stage's own footprint in-process — the
``prep`` mode therefore writes corpus + candidates to ``dir`` once,
and ``verify-mono`` / ``verify-sharded`` load them in FRESH processes
so each verify variant's peak RSS is its own. Corpus shape is
identical to tools/r14_probe.py (groups of 4 consecutive ids,
dup_rate collapse onto the group head's 40 base tokens + 0-2 per-doc
suffix tokens).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from r14_probe import PeakRss  # noqa: E402


def _verify_phase(out, mode, n_shards, work_dir):
    """Fresh-process verify A/B: load the prepped corpus + candidate
    parquet, build + persist the shingle arrays (one corpus scan —
    timed separately, shared by both variants), then verify either in
    one job or in K sequential candidate-hash slices. Peak RSS here
    is the verify variant's OWN footprint."""
    from pyspark.sql import functions as F

    from tabata_spark.operators.dedup import ngram_jaccard_pairs, token_shingles
    from tabata_spark.session import get_spark

    spark = get_spark("r15-verify-" + mode)
    docs = spark.read.parquet(os.path.join(work_dir, "corpus"))
    cand = spark.read.parquet(os.path.join(work_dir, "candidates"))
    with PeakRss() as rss:
        arr = docs.select(
            F.col("doc_id").alias("id"),
            token_shingles(F.col("text"), 3).alias("sh_arr"),
        ).persist()
        t0 = time.perf_counter()
        out["n_arr"] = arr.count()
        out["arr_build_s"] = round(time.perf_counter() - t0, 2)
        out["peak_rss_after_arr_mib"] = round(rss.peak_mib, 1)
        t0 = time.perf_counter()
        if mode == "verify-mono":
            n_pairs = ngram_jaccard_pairs(
                docs, threshold=0.8, candidates=cand, shingle_arrays=arr
            ).count()
        else:
            out["n_shards"] = n_shards
            slice_walls = []
            n_pairs = 0
            shard = F.pmod(F.xxhash64("id_a", "id_b"), F.lit(n_shards))
            for k in range(n_shards):
                tk = time.perf_counter()
                n_pairs += ngram_jaccard_pairs(
                    docs,
                    threshold=0.8,
                    candidates=cand.filter(shard == k),
                    shingle_arrays=arr,
                ).count()
                slice_walls.append(round(time.perf_counter() - tk, 2))
                print(
                    f"# verify slice {k}: {slice_walls[-1]}s"
                    f" (cum pairs {n_pairs},"
                    f" rss {round(rss.peak_mib, 1)} MiB)",
                    file=sys.stderr,
                )
            out["verify_slice_walls_s"] = slice_walls
        out["verify_s"] = round(time.perf_counter() - t0, 2)
        out["n_pairs"] = n_pairs
    out["peak_rss_mib"] = round(rss.peak_mib, 1)
    print(json.dumps(out))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    dup_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    mode = sys.argv[3] if len(sys.argv) > 3 else "mono"
    n_shards = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    work_dir = sys.argv[5] if len(sys.argv) > 5 else None
    assert mode in (
        "mono", "sharded", "prep", "verify-mono", "verify-sharded"
    ), mode

    if mode in ("verify-mono", "verify-sharded"):
        assert work_dir, "verify modes need the prep dir as argv[5]"
        _verify_phase(
            {"n_docs": n_docs, "mode": mode}, mode, n_shards, work_dir
        )
        return

    from pyspark.sql import functions as F

    from tabata_spark.operators.dedup import (
        minhash_candidates,
        minhash_signatures_from_shingles,
        ngram_jaccard_pairs,
        token_shingles,
    )
    from tabata_spark.session import get_spark

    spark = get_spark("r15-sharded-verify-probe")
    out: dict = {"n_docs": n_docs, "dup_rate": dup_rate, "mode": mode}
    if mode == "sharded":
        out["n_shards"] = n_shards

    # -- corpus: byte-identical construction to tools/r14_probe.py ----
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    base = F.when(
        F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(1_000_000))
        < int(dup_rate * 1_000_000),
        (F.col("doc_id") / 4).cast("long") * 4,
    ).otherwise(F.col("doc_id"))
    tok = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(F.col("__base"), F.lit(i)), F.lit(50_000))
    )
    suf = lambda i: F.concat(  # noqa: E731
        F.lit("s"), F.pmod(F.xxhash64(F.col("doc_id"), F.lit(100 + i)), F.lit(50_000))
    )
    n_suffix = F.pmod(F.col("doc_id"), F.lit(3))
    corpus = ids.withColumn("__base", base).select(
        "doc_id",
        "__base",
        F.concat_ws(
            " ",
            F.array(*[tok(i) for i in range(40)]),
            F.slice(F.array(*[suf(i) for i in range(2)]), F.lit(1), n_suffix),
        ).alias("text"),
    )
    tmp = work_dir or tempfile.mkdtemp(prefix="r15_probe_")
    path = os.path.join(tmp, "corpus")
    t0 = time.perf_counter()
    corpus.write.mode("overwrite").parquet(path)
    out["generate_write_s"] = round(time.perf_counter() - t0, 2)
    docs = spark.read.parquet(path)

    with PeakRss() as rss:
        # -- stage 1: shingle arrays + signatures + LSH candidates ----
        # (decomposed replica of near_dup_pairs' internals so the
        # candidate frame can be materialized ONCE and sliced)
        arr = docs.select(
            F.col("doc_id").alias("id"),
            token_shingles(F.col("text"), 3).alias("sh_arr"),
        ).persist()
        sh = arr.select("id", F.explode("sh_arr").alias("sh"))
        sig = minhash_signatures_from_shingles(sh, id_col="id", num_hashes=32)
        cand = (
            minhash_candidates(
                sig, id_col="id", bands=16, rows=2, max_bucket_size=50
            )
            .select("id_a", "id_b")
            .persist()
        )
        t0 = time.perf_counter()
        out["n_candidates"] = cand.count()
        out["candidates_s"] = round(time.perf_counter() - t0, 2)
        out["peak_rss_after_cand_mib"] = round(rss.peak_mib, 1)
        print(
            f"# candidates: {out['candidates_s']}s"
            f" ({out['n_candidates']} pairs,"
            f" rss {out['peak_rss_after_cand_mib']} MiB)",
            file=sys.stderr,
        )

        if mode == "prep":
            t0 = time.perf_counter()
            cand.write.mode("overwrite").parquet(
                os.path.join(tmp, "candidates")
            )
            out["candidates_write_s"] = round(time.perf_counter() - t0, 2)
            out["work_dir"] = tmp
            out["peak_rss_mib"] = round(rss.peak_mib, 1)
            print(json.dumps(out))
            return

        # -- stage 2: exact-Jaccard verify -----------------------------
        t0 = time.perf_counter()
        if mode == "mono":
            n_pairs = ngram_jaccard_pairs(
                docs, threshold=0.8, candidates=cand, shingle_arrays=arr
            ).count()
        else:
            slice_walls = []
            n_pairs = 0
            shard = F.pmod(F.xxhash64("id_a", "id_b"), F.lit(n_shards))
            for k in range(n_shards):
                tk = time.perf_counter()
                n_pairs += ngram_jaccard_pairs(
                    docs,
                    threshold=0.8,
                    candidates=cand.filter(shard == k),
                    shingle_arrays=arr,
                ).count()
                slice_walls.append(round(time.perf_counter() - tk, 2))
                print(
                    f"# verify slice {k}: {slice_walls[-1]}s"
                    f" (cum pairs {n_pairs},"
                    f" rss {round(rss.peak_mib, 1)} MiB)",
                    file=sys.stderr,
                )
            out["verify_slice_walls_s"] = slice_walls
        out["verify_s"] = round(time.perf_counter() - t0, 2)
        out["n_pairs"] = n_pairs
    out["peak_rss_mib"] = round(rss.peak_mib, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
