"""Stream-stream interval join: batch parity + state-bound plan
assertions (streaming/joins.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabata_spark.sources.relational import load_table
from tabata_spark.streaming.joins import attribution_pairs, attribution_summary
from tabata_spark.streaming.windows import read_events_stream, run_stream_to_memory


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _rows(df, keys):
    return sorted(tuple(r[k] for r in [r] for k in keys) for r in df.collect())


def test_stream_interval_join_matches_batch(spark, sf_dir, events):
    stream = read_events_stream(spark, sf_dir)
    pairs = attribution_pairs(stream)
    assert pairs.isStreaming
    # inner stream-stream joins emit on watermark advance; availableNow
    # over a finite file source drives the watermark to the end, and
    # append mode emits every pair (no windows held back for an inner
    # join with both sides' time bounds satisfied)
    got = run_stream_to_memory(pairs, "t_attrib_pairs", spark, mode="append")
    want = attribution_pairs(events)
    keys = ["user_id", "click_id", "purchase_id", "purchase_value"]
    assert _rows(got, keys) == _rows(want, keys)
    assert got.count() > 0


def test_stream_join_state_is_time_bounded(spark, sf_dir):
    """Both sides watermarked + event-time range in the condition —
    the two properties that let Spark evict join state. Assert they
    survive into the analyzed plan."""
    stream = read_events_stream(spark, sf_dir)
    pairs = attribution_pairs(stream)
    analyzed = pairs._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("EventTimeWatermark") == 2, analyzed[:500]


def test_attribution_summary_counts_purchases_once(spark, events):
    """A purchase with several preceding clicks must count once."""
    pairs = attribution_pairs(events)
    summary = attribution_summary(events)
    # distinct purchases per user from the raw pairs == n_attributed
    per_user = (
        pairs.groupBy("user_id")
        .agg(F.count_distinct("purchase_id").alias("n"))
        .collect()
    )
    want = {r["user_id"]: r["n"] for r in per_user}
    got = {r["user_id"]: r["n_attributed"] for r in summary.collect()}
    assert got == want and len(got) > 0
