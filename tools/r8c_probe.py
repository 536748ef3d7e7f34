"""Round-8 probe #3: stored signature index at corpus scale.

Seeds a corpus store (docs + signatures, as r8b), builds the banded
signature index, bh-clusters it into many files, then measures the
SERVING question the index exists for: a single-document near-dup
probe ("was this page crawled before?") — wall time, and how many
index files the probe's ~bands bucket hashes actually touch via
log-stats pruning — against the unindexed alternative (candidate
generation over a full signature-column scan of the corpus table).
Also times the index build and the clustered compact (one-off costs)
and a 1k-doc micro-batch indexed ingest with prune_key_limit on.

    python tools/r8c_probe.py [corpus_n] [index_files]
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
    incremental_near_dup,
    minhash_signatures,
)
from tabata_spark.operators.sigidx import (  # noqa: E402
    banded_rows,
    dedup_ingest_batch_indexed,
    neardup_probe,
    sigidx_build,
    sigidx_compact,
)
from tabata_spark.session import get_spark  # noqa: E402
from tabata_spark.sources.txlog import (  # noqa: E402
    tx_files_for_values,
    tx_read,
    tx_write,
)
from tools.r8b_probe import synth  # noqa: E402


def main():
    corpus_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark("r8c-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base = os.path.join(tempfile.gettempdir(), "r8_sigidx_probe")
    shutil.rmtree(base, ignore_errors=True)
    root, idx = os.path.join(base, "corpus"), os.path.join(base, "idx")

    corpus = synth(spark, corpus_n)
    sigs = minhash_signatures(corpus)
    # seed the corpus the way a real crawl lands: id-clustered files
    # with per-file id stats in the log, so point verifies prune
    tx_write(
        corpus.join(sigs, "doc_id")
        .select("doc_id", "text", "sig")
        .repartitionByRange(32, "doc_id"),
        root,
        stats_cols=["doc_id"],
    )

    t0 = time.perf_counter()
    sigidx_build(spark, root, idx)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    sigidx_compact(spark, idx, n_files=n_files)
    t_compact = time.perf_counter() - t0

    # probe text: corpus doc 12345 with one token swapped (jaccard ~.95)
    src = tx_read(spark, root).filter(F.col("doc_id") == 12345)
    text = src.select("text").head()[0]
    toks = text.split(" ")
    toks[7] = "zzz_mutant"
    probe_text = " ".join(toks)

    t0 = time.perf_counter()
    hits = neardup_probe(spark, root, idx, probe_text).collect()
    t_probe = time.perf_counter() - t0

    probe_df = spark.createDataFrame(
        [(999_999_999, probe_text)], "doc_id long, text string"
    )
    keys = [
        r["bh"]
        for r in banded_rows(minhash_signatures(probe_df)).select("bh").collect()
    ]
    kept, skipped = tx_files_for_values(idx, "bh", keys)

    # unindexed alternative: 1-doc batch vs full signature-column scan
    stored = tx_read(spark, root)
    t0 = time.perf_counter()
    pairs = incremental_near_dup(
        stored.select("doc_id", "text"),
        probe_df,
        corpus_sigs=stored.select("doc_id", "sig"),
    ).collect()
    t_scan = time.perf_counter() - t0

    # realistic micro-batch: 90% fresh, 10% exact copies of corpus
    # docs (collisions make the verify path actually execute — an
    # all-fresh batch lets AQE empty-relation propagation skip it)
    micro = synth(spark, 900, base=50_000_000).unionByName(
        synth(spark, 100).select(
            (F.col("doc_id") + 60_000_000).alias("doc_id"), "text"
        )
    )
    t0 = time.perf_counter()
    dedup_ingest_batch_indexed(
        spark, root, idx, micro, txn="probe:m1", prune_key_limit=65536
    )
    t_micro = time.perf_counter() - t0

    print(
        f"corpus={corpus_n} index: build={t_build:.1f}s "
        f"compact({n_files} files, bh-clustered)={t_compact:.1f}s\n"
        f"point probe (indexed): {t_probe:.2f}s hits={len(hits)} "
        f"files kept={len(kept)}/{len(kept) + skipped}\n"
        f"point probe (unindexed sig-scan): {t_scan:.2f}s "
        f"pairs={len(pairs)}\n"
        f"1k-doc indexed micro-ingest (pruned): {t_micro:.1f}s"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
