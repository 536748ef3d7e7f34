"""Round-14 scale probe: q_dedup_keep_best's PRODUCTION twin.

The certified battery query runs the ground-truth tier (exact-Jaccard
all-shared-shingle pairs — deliberately quadratic, documented memory
floor). The production path at corpus scale is LSH candidates →
exact verify on candidates only → connected components → per-cluster
quality argmax. This probe runs that full production pipeline on a
synthetic 2M-doc corpus with PLANTED near-dup clusters (known by
construction) and reports:

- wall time per stage (pairs / clusters / keep-best)
- peak RSS across the probe (python driver + spark JVM, sampled)
- recall vs the planted ground truth: fraction of multi-member
  planted clusters that came out (a) fully intact as one component
  and (b) with the correct kept (longest, min-id tie-break) document

    python tools/r14_probe.py [n_docs] [dup_rate]

Corpus shape: groups of 4 consecutive ids; a ``dup_rate`` fraction of
docs collapse onto their group head's 40 base tokens plus a per-doc
suffix of ``doc_id % 3`` extra tokens — pairwise shingle Jaccard
within a group is >= 38/42 ~ 0.90, comfortably over the 0.8 verify
threshold, while the varying suffix makes keep-best nontrivial
(lengths differ within a cluster). Ground truth comes from the
generator's own ``__base`` column, NOT from a quadratic scan.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class PeakRss:
    """Max summed RSS (MiB) of this python process + any java child,
    sampled from /proc every 0.5 s — the local-mode stand-in for
    executor/driver peak memory."""

    def __init__(self):
        self.peak_mib = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)

    @staticmethod
    def _rss_kib(pid: str) -> int:
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return 0

    def _sample(self) -> float:
        total = self._rss_kib(str(os.getpid()))
        for comm in glob.glob("/proc/[0-9]*/comm"):
            try:
                with open(comm) as f:
                    if f.read().strip() != "java":
                        continue
            except OSError:
                continue
            total += self._rss_kib(comm.split("/")[2])
        return total / 1024.0

    def _loop(self):
        while not self._stop.is_set():
            self.peak_mib = max(self.peak_mib, self._sample())
            self._stop.wait(0.5)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=2)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dup_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tabata_spark.operators.dedup import (
        dedup_cluster_assignments,
        near_dup_pairs,
    )
    from tabata_spark.session import get_spark

    spark = get_spark("r14-keepbest-probe")
    out: dict = {"n_docs": n_docs, "dup_rate": dup_rate}

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
    tmp = tempfile.mkdtemp(prefix="r14_probe_")
    path = os.path.join(tmp, "corpus")
    t0 = time.perf_counter()
    corpus.write.mode("overwrite").parquet(path)
    out["generate_write_s"] = round(time.perf_counter() - t0, 2)
    docs = spark.read.parquet(path)

    def probe(name, thunk):
        t = time.perf_counter()
        n = thunk()
        out[name] = round(time.perf_counter() - t, 2)
        print(f"# {name}: {out[name]}s ({n} rows)", file=sys.stderr)
        return n

    with PeakRss() as rss:
        # --- production pipeline -------------------------------------
        pairs = near_dup_pairs(
            docs.select("doc_id", "text"),
            num_hashes=32,
            bands=16,
            rows=2,
            threshold=0.8,
            max_bucket_size=50,
        ).persist()
        out["n_pairs"] = probe("lsh_verified_pairs", pairs.count)
        clusters = dedup_cluster_assignments(
            docs.select("doc_id", "text"), pairs.select("id_a", "id_b")
        ).persist()
        probe("cluster_assignments", clusters.count)
        sized = clusters.join(
            docs.select(
                F.col("doc_id").alias("id"), F.length("text").alias("n_chars")
            ),
            "id",
        )
        w = Window.partitionBy("comp").orderBy(F.desc("n_chars"), "id")
        kept = (
            sized.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("comp", F.col("id").alias("kept_id"), "csize")
            .persist()
        )
        out["n_clusters"] = probe("keep_best_argmax", kept.count)

        # --- recall vs planted ground truth --------------------------
        # truth: members sharing __base; expected kept = argmax
        # (length, min-id) within each multi-member planted group
        wt = Window.partitionBy("__base").orderBy(
            F.desc(F.length("text")), "doc_id"
        )
        truth = (
            docs.withColumn("gsize", F.count(F.lit(1)).over(Window.partitionBy("__base")))
            .filter(F.col("gsize") >= 2)
            .withColumn("rn", F.row_number().over(wt))
        ).persist()
        truth_groups = truth.filter(F.col("rn") == 1).select(
            F.col("__base").alias("g"),
            F.col("doc_id").alias("true_kept"),
            "gsize",
        )
        n_groups = truth_groups.count()
        # a planted group is FULLY recovered iff all members share one
        # comp AND that comp's csize equals the group size AND the
        # pipeline kept the true best doc
        member_comps = truth.select(
            F.col("__base").alias("g"), F.col("doc_id").alias("id"), "gsize"
        ).join(clusters.select("id", "comp", "csize"), "id")
        per_group = member_comps.groupBy("g", "gsize").agg(
            F.count_distinct("comp").alias("n_comps"),
            F.min("comp").alias("comp"),
            F.min("csize").alias("csize"),
        )
        intact = per_group.filter(
            (F.col("n_comps") == 1) & (F.col("csize") == F.col("gsize"))
        )
        n_intact = intact.count()
        kept_ok = (
            intact.join(kept.select("comp", "kept_id"), "comp")
            .join(truth_groups.select("g", "true_kept"), "g")
            .filter(F.col("kept_id") == F.col("true_kept"))
            .count()
        )
        out["planted_groups"] = n_groups
        out["cluster_recall"] = round(n_intact / max(n_groups, 1), 4)
        out["keep_best_accuracy"] = round(kept_ok / max(n_intact, 1), 4)
    out["peak_rss_mib"] = round(rss.peak_mib, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
