"""Continuous rollup maintenance: N incremental upserts ≡ one batch
rollup, including out-of-order (late) batches (operators/rollup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabata_spark.operators.rollup import read_rollup, rollup_events, upsert_rollup
from tabata_spark.sources.relational import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _norm(df):
    return sorted(
        (str(r["win_start"]), r["event_type"], r["n"],
         round(r["sum_value"], 6), round(r["min_value"], 6),
         round(r["max_value"], 6))
        for r in df.collect()
    )


def test_incremental_equals_batch(spark, events, tmp_path):
    store = str(tmp_path / "rollup")
    # split by event_id mod 3 — every batch spans the whole time range,
    # so EVERY upsert reopens existing buckets (the late-data path)
    for b in range(3):
        upsert_rollup(spark, store, events.filter(F.col("event_id") % 3 == b))
    got = _norm(spark.read.parquet(store).drop("win_date"))
    want = _norm(rollup_events(events).drop("win_date"))
    assert got == want


def test_touched_partition_merge_only(spark, events, tmp_path):
    """A second-day batch must not rewrite day-one partitions: stored
    day-one files stay byte-identical after an upsert that touches
    only other dates."""
    import glob
    import os

    store = str(tmp_path / "rollup2")
    dates = sorted(
        r["d"]
        for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    assert len(dates) >= 2, "fixture must span multiple dates"
    d0 = dates[0]
    upsert_rollup(spark, store, events.filter(F.to_date("ts") == d0))
    day1_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{store}/win_date={d0}/*.parquet")
    }
    assert day1_files
    upsert_rollup(spark, store, events.filter(F.to_date("ts") != d0))
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{store}/win_date={d0}/*.parquet")
    }
    assert after == day1_files  # untouched partitions not rewritten


def test_read_rollup_derives_avg(spark, events, tmp_path):
    store = str(tmp_path / "rollup3")
    upsert_rollup(spark, store, events)
    view = read_rollup(spark, store)
    row = view.orderBy("win_start", "event_type").first()
    assert abs(row["avg_value"] - row["sum_value"] / row["n"]) < 1e-12
    assert view.count() == rollup_events(events).count()


def test_hll_distinct_merges_exactly(spark, events, tmp_path):
    """Sketch merge algebra: incrementally merged HLL sketches give
    the SAME estimate as the one-shot sketch (union-of-sketches ==
    sketch-of-union), across late-data upserts; and at the fixture's
    small per-bucket cardinalities the estimate equals the true
    distinct count (HLL++ sparse mode is exact there)."""
    store = str(tmp_path / "rollup_hll")
    for b in range(3):
        upsert_rollup(
            spark,
            store,
            events.filter(F.col("event_id") % 3 == b),
            distinct_col="user_id",
        )
    inc = {
        (str(r["win_start"]), r["event_type"]): r["approx_user_id_distinct"]
        for r in read_rollup(spark, store, distinct_col="user_id").collect()
    }
    batch = rollup_events(events, distinct_col="user_id")
    one = {
        (str(r["win_start"]), r["event_type"]): r["est"]
        for r in batch.select(
            "win_start",
            "event_type",
            F.hll_sketch_estimate("user_id_hll").alias("est"),
        ).collect()
    }
    assert inc == one
    true = {
        (str(r["win_start"]), r["event_type"]): r["d"]
        for r in events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .select(F.col("win.start").alias("win_start"), "event_type", "d")
        .collect()
    }
    exact_hits = sum(1 for k, v in inc.items() if v == true[k])
    assert exact_hits / len(inc) > 0.95, (exact_hits, len(inc))


def test_apply_delta_matches_full_recompute(spark, sf_dir, tmp_path):
    """CDC delta (delete + insert on one date) folded by partial
    recompute must equal a from-scratch rollup of the mutated base —
    including the non-retractable min/max stats."""
    from pyspark.sql import functions as F

    from tabata_spark.operators.rollup import apply_delta, rollup_events
    from tabata_spark.sources.relational import _normalize_ts

    ev = _normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    store = str(tmp_path / "roll")
    rollup_events(ev).write.partitionBy("win_date").parquet(store)

    # mutate: delete every 7th event on the busiest date, bump values
    target = (
        ev.groupBy(F.to_date("ts").alias("d")).count().orderBy(F.desc("count"))
        .collect()[0]["d"]
    )
    deleted = ev.filter(
        (F.to_date("ts") == F.lit(target)) & (F.col("event_id") % 7 == 0)
    )
    mutated = ev.join(deleted.select("event_id"), "event_id", "left_anti")
    apply_delta(spark, store, mutated, deleted)

    got = {
        (str(r["win_start"]), r["event_type"]): (
            r["n"],
            round(r["sum_value"], 6),
            round(r["min_value"], 6),
            round(r["max_value"], 6),
        )
        for r in spark.read.parquet(store).collect()
    }
    want = {
        (str(r["win_start"]), r["event_type"]): (
            r["n"],
            round(r["sum_value"], 6),
            round(r["min_value"], 6),
            round(r["max_value"], 6),
        )
        for r in rollup_events(mutated).collect()
    }
    assert got == want


def test_apply_delta_drops_fully_deleted_dates(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from tabata_spark.operators.rollup import apply_delta, rollup_events
    from tabata_spark.sources.relational import _normalize_ts

    ev = _normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    store = str(tmp_path / "roll")
    rollup_events(ev).write.partitionBy("win_date").parquet(store)
    target = ev.select(F.to_date("ts").alias("d")).distinct().orderBy("d").collect()[0]["d"]
    deleted = ev.filter(F.to_date("ts") == F.lit(target))
    mutated = ev.join(deleted.select("event_id"), "event_id", "left_anti")
    apply_delta(spark, store, mutated, deleted)
    left = (
        spark.read.parquet(store)
        .filter(F.col("win_date") == F.lit(target))
        .count()
    )
    assert left == 0


def test_apply_delta_drops_emptied_date_while_other_survives(spark, sf_dir, tmp_path):
    """The r6 ADVICE bug: one delta that fully empties date A while
    date B keeps rows. The write path only overwrites partitions
    present in the recomputed data, so A's stale partition must be
    removed explicitly — the store must equal a from-scratch rollup."""
    from pyspark.sql import functions as F

    from tabata_spark.operators.rollup import apply_delta, rollup_events
    from tabata_spark.sources.relational import _normalize_ts

    ev = _normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    store = str(tmp_path / "roll")
    rollup_events(ev).write.partitionBy("win_date").parquet(store)
    d = [
        r["d"]
        for r in ev.select(F.to_date("ts").alias("d")).distinct().orderBy("d").collect()
    ]
    assert len(d) >= 2
    day_gone, day_kept = d[0], d[1]
    # delete ALL of day_gone, and only the even events of day_kept
    deleted = ev.filter(
        (F.to_date("ts") == F.lit(day_gone))
        | ((F.to_date("ts") == F.lit(day_kept)) & (F.col("event_id") % 2 == 0))
    )
    mutated = ev.join(deleted.select("event_id"), "event_id", "left_anti")
    apply_delta(spark, store, mutated, deleted)

    stored = spark.read.parquet(store)
    assert stored.filter(F.col("win_date") == F.lit(day_gone)).count() == 0
    got = {
        (str(r["win_start"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in stored.collect()
    }
    want = {
        (str(r["win_start"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in rollup_events(mutated).collect()
    }
    assert got == want
