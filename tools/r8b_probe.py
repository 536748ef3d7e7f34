"""Round-8 probe #2: continuous-ingestion dedup at corpus scale.

Seeds a 2M-doc transactional corpus store (docs + minhash signatures
in one table — the signature cache), then measures the RECURRING
cost: one 100k-doc batch ingested against it (10% of the batch
near-dups the stored corpus, 5% duplicates a batch-mate).

    python tools/r8b_probe.py [corpus_n] [batch_n]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tabata_spark.operators.dedup import (  # noqa: E402
    dedup_ingest_batch,
    minhash_signatures,
)
from tabata_spark.session import get_spark  # noqa: E402
from tabata_spark.sources.txlog import tx_read, tx_write  # noqa: E402


def synth(spark, n, base=0, vocab=50_000, toks=40):
    """Deterministic synthetic docs: 40 tokens from a 50k vocab."""
    return spark.range(n).select(
        (F.col("id") + base).alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(toks - 1)),
                lambda p: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id") + base, p), F.lit(vocab)),
                ),
            ),
            " ",
        ).alias("text"),
    )


def main():
    corpus_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("r8b-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    root = os.path.join(tempfile.gettempdir(), "r8_ingest_probe")
    shutil.rmtree(root, ignore_errors=True)

    corpus = synth(spark, corpus_n)
    t0 = time.perf_counter()
    sigs = minhash_signatures(corpus)
    tx_write(corpus.join(sigs, "doc_id").select("doc_id", "text", "sig"), root)
    t_seed = time.perf_counter() - t0

    # batch: 85% fresh, 10% copies of corpus docs, 5% copies of the
    # batch's own fresh docs (ids chosen so every copy's source exists)
    fresh = synth(spark, int(batch_n * 0.85), base=10_000_000)
    cdup = synth(spark, int(batch_n * 0.10)).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    bdup = synth(spark, int(batch_n * 0.05), base=10_000_000).select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"), "text"
    )
    batch = fresh.unionByName(cdup).unionByName(bdup)

    t0 = time.perf_counter()
    dedup_ingest_batch(spark, root, batch, txn="probe:b1")
    t_ingest = time.perf_counter() - t0
    n_after = tx_read(spark, root).count()

    t0 = time.perf_counter()
    dedup_ingest_batch(spark, root, batch, txn="probe:b1")  # replay
    t_replay = time.perf_counter() - t0

    survivors = n_after - corpus_n
    print(
        f"corpus={corpus_n} seed(sig+write)={t_seed:.1f}s\n"
        f"batch={batch_n} ingest={t_ingest:.1f}s survivors={survivors} "
        f"(expect ~{int(batch_n * 0.85)})\n"
        f"replay(no-op)={t_replay:.2f}s"
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
