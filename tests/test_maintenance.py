"""Store compaction: fragmented multi-batch store → few sorted files,
data identical, row-group stats tight (core/maintenance.py)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tabata_spark.core.maintenance import compact_store, store_file_stats


@pytest.fixture()
def fragmented_store(spark, tmp_path):
    """Simulate recurring micro-batch appends: 5 unsorted batches into
    the same partitioned store."""
    out = str(tmp_path / "store")
    for b in range(5):
        (
            spark.range(b * 200, (b + 1) * 200)
            .select(
                (F.col("id") % 4).cast("string").alias("record_id"),
                # write in descending order so files start stat-hostile
                (F.lit(1000) - F.col("id")).alias("seq"),
                F.rand(seed=b).alias("value"),
            )
            .repartition(4)
            .write.mode("append")
            .partitionBy("record_id")
            .parquet(out)
        )
    return out


def test_compact_reduces_files_preserves_data(spark, fragmented_store):
    before = store_file_stats(spark, fragmented_store)
    assert before["n_files"] > 4 * 5  # ≥1 file per batch per partition

    want = sorted(
        map(tuple, spark.read.parquet(fragmented_store).collect())
    )
    compact_store(spark, fragmented_store, "record_id", "seq")
    after = store_file_stats(spark, fragmented_store)
    got = sorted(map(tuple, spark.read.parquet(fragmented_store).collect()))

    assert got == want
    assert after["n_partitions"] == 4
    assert after["n_files"] == 4  # one file per partition


def test_compacted_files_are_sorted_with_tight_stats(spark, fragmented_store):
    import glob

    compact_store(spark, fragmented_store, "record_id", "seq")
    files = glob.glob(f"{fragmented_store}/record_id=*/*.parquet")
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        # row groups must not overlap on seq (sorted file → each row
        # group's min > previous row group's max) and stats present
        prev_max = None
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "seq"
            )
            stats = col.statistics
            assert stats is not None and stats.has_min_max
            if prev_max is not None:
                assert stats.min > prev_max
            prev_max = stats.max


def test_compact_recovers_from_mid_swap_crash(spark, tmp_path):
    """A crash between the two swap renames leaves the ONLY complete
    copy at <path>.__old__ — a re-run must restore it, not delete it."""
    import os

    from tabata_spark.core.maintenance import compact_store

    path = str(tmp_path / "store")
    df = spark.range(100).selectExpr(
        "cast(id % 5 as string) record_id", "id seq", "id * 2.0 value"
    )
    df.write.partitionBy("record_id").parquet(path)
    # simulate the crash window: path renamed away, swap never finished
    os.rename(path, path + ".__old__")
    assert not os.path.exists(path)

    compact_store(spark, path)
    got = spark.read.parquet(path)
    assert got.count() == 100
    assert sorted(r["seq"] for r in got.collect()) == list(range(100))
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__compact__")


def test_zorder_layout_narrows_every_dimension(spark, tmp_path):
    """Linear sort gives tight per-file ranges on ONE dimension and
    full-domain ranges on the rest; Z-order narrows BOTH. Checked on
    the actual parquet footers (file-level min/max stats) — the stats
    a scan's row-group pruning consults."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from tabata_spark.core.maintenance import zorder_write

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1024)).alias("y"),
    )

    def file_ranges(path):
        out = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            mins = {c: None for c in names}
            maxs = {c: None for c in names}
            for g in range(md.num_row_groups):
                for i, c in enumerate(names):
                    st = md.row_group(g).column(i).statistics
                    mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                    maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
            out.append({c: (mins[c], maxs[c]) for c in names})
        return out

    linear = str(tmp_path / "linear")
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(linear)
    zpath = str(tmp_path / "zorder")
    zorder_write(df, zpath, cols=["x", "y"], bits=10, n_files=8)

    def avg_span(ranges, c):
        return sum((r[c][1] - r[c][0]) / 1023.0 for r in ranges) / len(ranges)

    lin = file_ranges(linear)
    zo = file_ranges(zpath)
    # linear: x tight, y full-domain in every file
    assert avg_span(lin, "x") < 0.3
    assert avg_span(lin, "y") > 0.9
    # z-order: BOTH dimensions narrow — box predicates on either prune
    assert avg_span(zo, "x") < 0.7, avg_span(zo, "x")
    assert avg_span(zo, "y") < 0.7, avg_span(zo, "y")
    # and no rows were lost
    total = sum(
        pq.ParquetFile(f).metadata.num_rows for f in glob.glob(f"{zpath}/part-*.parquet")
    )
    assert total == n
