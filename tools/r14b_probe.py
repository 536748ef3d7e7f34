"""Round-14 probe B: the hot-bucket SALT policy's scale price tag.

hot_bucket='salt' (bucket_candidate_pairs / minhash_candidates /
simhash_near_pairs) is the recall-preserving alternative to dropping
over-cap buckets. This measures what it costs and what it buys at
probe scale: a 2M-doc corpus where 2% of docs are spread across 50
BOILERPLATE templates (~800 identical docs each — every band bucket
for them is far over cap 50) plus the usual 5% small planted dup
groups. The fused pipeline runs once with hot_bucket='drop' and once
with 'salt':

- wall time each (the salt overhead = one extra count-aggregate over
  banded rows + a broadcast join)
- verified pairs found inside the boilerplate groups (drop: 0 by
  construction; salt: partial, bounded by shard odds)
- small-group pair recall under both (must be identical — cold
  buckets are untouched by the policy)

    python tools/r14b_probe.py [n_docs]
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

    from tabata_spark.operators.dedup import near_dup_pairs
    from tabata_spark.session import get_spark

    spark = get_spark("r14b-salt-probe")
    out: dict = {"n_docs": n_docs}

    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    h = F.pmod(F.xxhash64("doc_id", F.lit(11)), F.lit(1000))
    # 2%: one of 50 boilerplate templates (ids >= n_docs reserved as
    # template keys so boilerplate bases never collide with real ids);
    # 5%: small planted groups of 4; rest unique
    base = (
        F.when(h < 20, F.lit(n_docs) + F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(50)))
        .when(h < 70, (F.col("doc_id") / 4).cast("long") * 4)
        .otherwise(F.col("doc_id"))
    )
    tok = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(F.col("__base"), F.lit(i)), F.lit(50_000))
    )
    corpus = ids.withColumn("__base", base).select(
        "doc_id",
        "__base",
        F.concat_ws(" ", *[tok(i) for i in range(40)]).alias("text"),
    )
    tmp = tempfile.mkdtemp(prefix="r14b_probe_")
    path = os.path.join(tmp, "corpus")
    corpus.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    boiler_ids = docs.filter(F.col("__base") >= n_docs).select(
        F.col("doc_id").alias("id_a")
    ).persist()
    n_boiler = boiler_ids.count()
    out["n_boilerplate_docs"] = n_boiler

    def run(policy):
        t0 = time.perf_counter()
        pairs = near_dup_pairs(
            docs.select("doc_id", "text"),
            num_hashes=32,
            bands=16,
            rows=2,
            threshold=0.8,
            max_bucket_size=50,
            hot_bucket=policy,
        ).persist()
        n = pairs.count()
        wall = round(time.perf_counter() - t0, 2)
        # a pair is boilerplate iff its left member is (groups never mix)
        n_boil = pairs.join(boiler_ids, "id_a", "left_semi").count()
        pairs.unpersist()
        return wall, n, n_boil

    # drop first (cold), salt, then drop again warm — the warm drop is
    # the fair wall baseline for the salt overhead (same JVM state).
    for tag, policy in (("drop", "drop"), ("salt", "salt"), ("drop_warm", "drop")):
        wall, n, n_boil = run(policy)
        out[f"{tag}_wall_s"] = wall
        out[f"{tag}_pairs"] = n
        out[f"{tag}_boiler_pairs"] = n_boil
        out[f"{tag}_small_group_pairs"] = n - n_boil
        print(
            f"# {tag}: {wall}s, {n} pairs ({n_boil} boilerplate)",
            file=sys.stderr,
        )

    out["salt_overhead_pct"] = round(
        100.0
        * (out["salt_wall_s"] - out["drop_warm_wall_s"])
        / out["drop_warm_wall_s"],
        1,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
