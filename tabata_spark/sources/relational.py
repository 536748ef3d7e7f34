"""Loaders for the driver's relational test tables and the
events→signals adapter.

``events`` (event_id, ts, user_id, event_type, value, props) doubles
as a signal-stream analog (FIXTURES.md F5): ``user_id`` plays
``record_id`` and ``value`` a channel, which lets every per-record
signal operator be DuckDB-oracle-checked on driver-provided data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Every temporal column in the driver's testdata. A LongType or
#: StringType column with one of these names is a regeneration shape
#: (INT64-ns under nanosAsLong / ISO-8601 text), never business data.
TEMPORAL_COLS = frozenset({"ts", "o_orderdate", "l_shipdate"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # runtime-settable SQL confs: required even when the caller's session
    # wasn't built by tabata_spark.session.get_spark (e.g. the driver's
    # own bare SparkSession in the verify harness). The UTC pin keeps
    # NTZ-reinterpretation and date_format/epoch arithmetic identical to
    # the DuckDB oracles even on a host whose JVM default zone isn't UTC.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _normalize_ts(df)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize every temporal column to session-zone TIMESTAMP
    regardless of the parquet physical shape. A Spark engine reading
    foreign parquet must own the timestamp type explicitly; two shapes
    occur in driver testdata history:

    - legacy ``timestamp[ns]`` → raw INT64 under ``nanosAsLong``
      (``ts`` only): truncate to microseconds with integer division
      (ns magnitudes exceed double precision — ``div``, never ``/``)
      to match DuckDB's CAST(ts_ns AS TIMESTAMP) truncation in oracles;
    - current ``timestamp[us]`` naive → TIMESTAMP_NTZ in Spark 3.5+/4:
      cast to TIMESTAMP. The session timezone is UTC (session.py), so
      the wall-clock field values are reinterpreted as UTC instants —
      bit-identical to DuckDB's ``epoch(ts)`` on the same file, and
      makes the column castable to DOUBLE and usable as watermark
      event time (TIMESTAMP_NTZ is neither).

    ALL TimestampNTZType columns are normalized, not just ``ts`` —
    ``o_orderdate``/``l_shipdate`` arrive in the same naive-µs shape,
    and leaving them NTZ keeps the round-3 trap armed for the first
    query that does epoch arithmetic on them. The INT64-ns and
    ISO-string shapes are likewise handled for EVERY known temporal
    column (not just ``ts``): a Long column named in ``TEMPORAL_COLS``
    can only be ``nanosAsLong`` output, and a String one is parsed as a
    session-zone wall clock via ``cast("timestamp")`` — matching
    DuckDB's implicit VARCHAR→TIMESTAMP cast under UTC.
    """
    for f in df.schema.fields:
        if f.name in TEMPORAL_COLS and isinstance(
            f.dataType, (T.LongType, T.StringType)
        ):
            if isinstance(f.dataType, T.LongType):
                df = df.withColumn(
                    f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000"))
                )
            else:
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def events_as_signals(events: DataFrame) -> DataFrame:
    """Long signal layout from the events table.

    ``seq`` is the 0-based position within each user's event stream
    ordered by (ts, event_id) — the event_id tiebreak makes the
    ordering total, so results are deterministic and oracle-matchable.
    """
    # materialize record_id BEFORE the seq window so the window
    # partitions on the same attribute every downstream record window
    # uses — one shuffle for the whole signal pipeline (windowing on
    # user_id and re-shuffling on cast(user_id) would double-exchange)
    base = events.select(
        F.col("user_id").cast("string").alias("record_id"),
        "ts",
        "event_id",
        "event_type",
        "value",
        "props",
    )
    w = Window.partitionBy("record_id").orderBy("ts", "event_id")
    return base.select(
        "record_id",
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("seq"),
        "ts",
        "event_id",
        "event_type",
        "value",
        "props",
    )


#: Shared CTE used by every oracle over the signal view of events.
SIGNALS_CTE = """
WITH signals AS (
  SELECT CAST(user_id AS VARCHAR) AS record_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS seq,
         CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value, props
  FROM events
)
"""
