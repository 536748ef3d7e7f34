"""Round-8 probe: z-order txlog compaction + box skipping at 20M rows.

Measures (local[32], inputs written through the tx log itself):
- 4x5M shard appends, z-order compact over two independent uniform
  integer dims into 64 files
- box-read latency + files skipped for a ~1% 2-D box, vs the same
  predicate over a full snapshot scan (no skipping)
- single-dimension range on the NON-leading dim (the case 1-D
  clustering cannot prune)

    python tools/r8_probe.py [n_rows]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tabata_spark.session import get_spark  # noqa: E402
from tabata_spark.sources.txlog import (  # noqa: E402
    tx_compact,
    tx_files_for_box,
    tx_read,
    tx_read_box,
    tx_write,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("r8-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    root = os.path.join(tempfile.gettempdir(), "r8_zorder_probe")
    shutil.rmtree(root, ignore_errors=True)

    # two independent uniform dims derived from id by hashing
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000)).alias("y"),
        F.col("id").alias("v"),
    )
    t0 = time.perf_counter()
    for shard in range(4):
        tx_write(df.filter(F.col("id") % 4 == shard), root)
    t_append = time.perf_counter() - t0

    t0 = time.perf_counter()
    tx_compact(spark, root, n_files=64, zorder_by=["x", "y"])
    t_compact = time.perf_counter() - t0

    box = {"x": (0, 9_999), "y": (0, 9_999)}  # 1% of the plane
    kept, skipped = tx_files_for_box(root, box)
    t0 = time.perf_counter()
    n_box = tx_read_box(spark, root, box).count()
    t_box = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_full = (
        tx_read(spark, root)
        .filter(
            (F.col("x") >= 0) & (F.col("x") <= 9_999)
            & (F.col("y") >= 0) & (F.col("y") <= 9_999)
        )
        .count()
    )
    t_full = time.perf_counter() - t0

    _, skipped_y = tx_files_for_box(root, {"y": (0, 9_999)})

    assert n_box == n_full, (n_box, n_full)
    print(
        f"rows={n} append4x={t_append:.1f}s zorder_compact={t_compact:.1f}s\n"
        f"2D box (1%): kept={len(kept)}/64 skipped={skipped} "
        f"box_read={t_box:.2f}s full_scan_same_pred={t_full:.2f}s "
        f"({n_box} rows)\n"
        f"y-only range (10%): skipped={skipped_y}/64"
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
