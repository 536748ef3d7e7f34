"""Regression tests for parquet timestamp-shape drift at ingest.

Round-3 lesson: the driver regenerated testdata as naive
``timestamp[us]`` parquet, which Spark 3.5+/4 reads as TIMESTAMP_NTZ —
an illegal source for ``cast("double")`` and rejected outright by
``withWatermark``. Nothing in the suite read an NTZ ``ts``, so the
breakage was first seen by the driver. These tests pin every ts shape
the loader claims to handle (sources/relational.py:_normalize_ts):

- naive ``timestamp[us]``  → TIMESTAMP_NTZ  → normalized TIMESTAMP
- ``timestamp[ns]`` (INT64 nanos under nanosAsLong → LongType)
  → normalized TIMESTAMP
- tz-aware ``timestamp[us, UTC]`` → TIMESTAMP (already fine, unchanged)

and assert the two entry paths that died in round 3 analyze and agree:
batch signals with an epoch-seconds expression, and a streaming
watermarked tumbling aggregation.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _events_arrow(ts_type: pa.DataType) -> pa.Table:
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), i % 3, "click", float(i), "{}")
        for i in range(60)
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows]).cast(ts_type),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )


@pytest.fixture(
    scope="module",
    params=["us_naive", "ns_naive", "us_utc", "iso_string"],
)
def shaped_dir(request, tmp_path_factory):
    """A directory holding events.parquet in one physical ts shape."""
    d = tmp_path_factory.mktemp(f"tsshape_{request.param}")
    if request.param == "iso_string":
        t = _events_arrow(pa.timestamp("us"))
        idx = t.schema.get_field_index("ts")
        iso = pa.array(
            [v.as_py().isoformat(sep=" ") for v in t.column("ts")], pa.string()
        )
        t = t.set_column(idx, "ts", iso)
    else:
        type_map = {
            "us_naive": pa.timestamp("us"),
            "ns_naive": pa.timestamp("ns"),
            "us_utc": pa.timestamp("us", tz="UTC"),
        }
        t = _events_arrow(type_map[request.param])
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_load_table_normalizes_ts_to_timestamp(spark, shaped_dir):
    from tabata_spark.sources.relational import load_table

    df = load_table(spark, shaped_dir, "events")
    (ts_field,) = [f for f in df.schema.fields if f.name == "ts"]
    assert isinstance(ts_field.dataType, T.TimestampType), ts_field.dataType
    # epoch seconds must analyze AND match the known wall-clock values
    # (session tz is UTC, so naive fields are reinterpreted as UTC)
    first = (
        df.orderBy("event_id")
        .select(F.col("ts").cast("double").alias("s"))
        .first()["s"]
    )
    assert first == dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()


def test_signals_duration_analyzes_on_all_shapes(spark, shaped_dir):
    """The round-3 flagship failure mode: groupBy + ts epoch-diff."""
    from tabata_spark.sources.relational import events_as_signals, load_table

    sig = events_as_signals(load_table(spark, shaped_dir, "events"))
    out = (
        sig.groupBy("record_id")
        .agg(
            (
                (F.max("ts").cast("double") - F.min("ts").cast("double")) / 3600.0
            ).alias("duration_h")
        )
        .orderBy("record_id")
        .collect()
    )
    assert len(out) == 3
    # 60 events, 3 users round-robin, 7-min spacing -> 20 events per
    # user, 19 inter-event gaps of 21 min each = 6.65 h for every user
    assert all(abs(r["duration_h"] - 6.65) < 1e-9 for r in out)


def test_no_ntz_leaks_past_loader_any_table(spark):
    """Driver-drift insurance: every table at every scale factor loads
    with zero TIMESTAMP_NTZ columns surviving normalization — the
    whole round-3 failure class, checked against the REAL testdata so
    the next regeneration is caught here instead of by the driver."""
    import os

    from tabata_spark.sources.relational import TABLES, load_table

    for sf in ("sf0.001", "sf0.01"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        for t in TABLES:
            df = load_table(spark, d, t)
            ntz = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, T.TimestampNTZType)
            ]
            assert not ntz, (sf, t, ntz)


def _orders_arrow(shape: str) -> pa.Table:
    base = dt.datetime(1994, 6, 1, 0, 0, 0)
    rows = [(i, i % 5, base + dt.timedelta(days=3 * i)) for i in range(40)]
    dates = pa.array([r[2] for r in rows])
    if shape == "iso_string":
        od = pa.array([r[2].isoformat(sep=" ") for r in rows], pa.string())
    else:
        od = dates.cast(
            {
                "us_naive": pa.timestamp("us"),
                "ns_naive": pa.timestamp("ns"),
                "us_utc": pa.timestamp("us", tz="UTC"),
            }[shape]
        )
    return pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderdate": od,
            "o_totalprice": pa.array([100.0 + r[0] for r in rows], pa.float64()),
        }
    )


@pytest.fixture(
    scope="module",
    params=["us_naive", "ns_naive", "us_utc", "iso_string"],
)
def orders_shaped_dir(request, tmp_path_factory):
    """orders.parquet with o_orderdate in one physical shape — the
    second half of the regeneration matrix (VERDICT r4 item 7): the
    loader must own EVERY temporal column, not just ``ts``."""
    d = tmp_path_factory.mktemp(f"odshape_{request.param}")
    pq.write_table(_orders_arrow(request.param), str(d / "orders.parquet"))
    return str(d)


def test_orderdate_normalizes_and_epoch_matches_duckdb(spark, orders_shaped_dir):
    """All four shapes load as TIMESTAMP and agree with DuckDB's
    epoch() on the same file — exact, row by row."""
    import duckdb

    from tabata_spark.sources.relational import load_table

    df = load_table(spark, orders_shaped_dir, "orders")
    (od,) = [f for f in df.schema.fields if f.name == "o_orderdate"]
    assert isinstance(od.dataType, T.TimestampType), od.dataType

    got = {
        r["o_orderkey"]: r["es"]
        for r in df.select(
            "o_orderkey",
            F.unix_micros("o_orderdate").alias("es"),
        ).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT o_orderkey, CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)"
            f" FROM '{orders_shaped_dir}/orders.parquet' "
        ).fetchall()
    )
    assert got == want


def test_orderdate_date32_stays_date_and_matches_duckdb(spark, tmp_path):
    """date32 is the remaining plausible regeneration shape for a date
    column. The loader must LEAVE it as DATE — DuckDB reads date32 as
    DATE too, so both engines stringify identically ('1994-06-01');
    normalizing to TIMESTAMP would diverge ('1994-06-01 00:00:00')
    and hash-mismatch every query that emits the column. Comparisons
    still work: Spark upcasts DATE against timestamp literals."""
    import duckdb

    from tabata_spark.sources.relational import load_table

    t = _orders_arrow("us_naive")
    idx = t.schema.get_field_index("o_orderdate")
    t = t.set_column(idx, "o_orderdate", t.column("o_orderdate").cast(pa.date32()))
    d = tmp_path / "d32"
    d.mkdir()
    pq.write_table(t, str(d / "orders.parquet"))

    df = load_table(spark, str(d), "orders")
    (od,) = [f for f in df.schema.fields if f.name == "o_orderdate"]
    assert isinstance(od.dataType, T.DateType), od.dataType

    got = sorted(
        (r["o_orderkey"], str(r["o_orderdate"])) for r in df.collect()
    )
    want = sorted(
        (k, str(v))
        for k, v in duckdb.sql(
            f"SELECT o_orderkey, o_orderdate FROM '{d}/orders.parquet'"
        ).fetchall()
    )
    assert got == want
    # the TPC-H filter pattern still selects the right keys
    keys = sorted(
        r["o_orderkey"]
        for r in df.filter(
            F.col("o_orderdate") < F.lit("1994-07-01").cast("timestamp")
        ).collect()
    )
    assert keys == list(range(10))


def test_orderdate_filter_pushdown_survives_shapes(spark, orders_shaped_dir):
    """A date-range predicate still returns the right keys under every
    physical shape (the TPC-H q3/q5 filter pattern)."""
    from tabata_spark.sources.relational import load_table

    df = load_table(spark, orders_shaped_dir, "orders")
    keys = sorted(
        r["o_orderkey"]
        for r in df.filter(
            F.col("o_orderdate") < F.lit("1994-07-01").cast("timestamp")
        ).collect()
    )
    # base 1994-06-01 + 3d*i < 1994-07-01  =>  i in 0..9
    assert keys == list(range(10))


def test_streaming_watermark_accepts_normalized_ts(spark, shaped_dir):
    """withWatermark hard-rejects TIMESTAMP_NTZ event time — the
    streaming half of the round-3 breakage."""
    from tabata_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        tumbling_agg,
    )

    stream = read_events_stream(spark, shaped_dir)
    assert stream.isStreaming
    # complete mode: append would hold back windows above the final
    # watermark on a finite stream (see test_streaming.py)
    got = run_stream_to_memory(
        tumbling_agg(stream, width="1 hour", watermark="2 hours"),
        f"ts_shape_{abs(hash(shaped_dir)) % 10**8}",
        spark,
        mode="complete",
    )
    batch = tumbling_agg(
        __import__(
            "tabata_spark.sources.relational", fromlist=["load_table"]
        ).load_table(spark, shaped_dir, "events")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
