"""Flight-analysis operators — the reference's end-to-end exam workload.

Implements the cruise-extraction + per-record summary analysis of the
reference exam notebook (exercices/examen 2019, cells 47-68) as pure
DataFrame expressions:

- P7 derived boolean predicate: cruise flag
  ``(ALT > max(ALT) - 2000) & (abs(Vz) < 1)`` where ``max(ALT)`` is
  per-record (exam cell 53);
- A2 per-record min/max/mean summary with duration and fuel burn from
  ordered first/last (exam cells 47,56).

Everything is a record-window expression + one groupBy(record_id)
aggregation: a single shuffle on record_id end-to-end, map-side
partial aggregation, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tabata_spark.operators.timeutil import duration_h


def with_cruise_flag(
    df: DataFrame,
    alt: str = "ALT[m]",
    vz: str = "Vz[m/s]",
    flag: str = "CR",
    alt_margin: float = 2000.0,
    vz_limit: float = 1.0,
) -> DataFrame:
    """Cruise phase flag (exam cell 53): within ``alt_margin`` of the
    record's max altitude and |vertical speed| < ``vz_limit``."""
    # ordered frame, not bare partitionBy: Spark's unordered window
    # path buffers whole groups and runs ~4x slower at 10M rows
    w = (
        Window.partitionBy("record_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    mx = F.max(F.col(alt)).over(w)
    return df.withColumn(
        flag,
        (F.col(alt) > mx - F.lit(alt_margin)) & (F.abs(F.col(vz)) < F.lit(vz_limit)),
    )


def flight_summary(
    df: DataFrame,
    alt: str = "ALT[m]",
    tisa: str = "Tisa[K]",
    tas: str = "TAS[m/s]",
    masse: str = "Masse[kg]",
) -> DataFrame:
    """Per-record flight summary (exam cell 47/56):

    max altitude, min temperature, mean airspeed, duration in hours,
    and consumption = (first(Masse) - last(Masse)) / hours using
    seq-ordered first/last.
    """
    hours = duration_h(F.max("ts"), F.min("ts"))
    return df.groupBy("record_id").agg(
        F.max(alt).alias("alt_max"),
        F.min(tisa).alias("tisa_min"),
        F.avg(tas).alias("tas_mean"),
        hours.alias("duration_h"),
        (
            (F.max_by(masse, F.col("seq") * -1) - F.max_by(masse, "seq")) / hours
        ).alias("conso_kg_h"),
        F.count(F.lit(1)).alias("n_points"),
    )


def cruise_summary(df: DataFrame, **kwargs) -> DataFrame:
    """Flag cruise rows, keep them, summarize per record — the full
    exam pipeline (cells 53-56)."""
    return flight_summary(with_cruise_flag(df, **kwargs).filter(F.col("CR")))
