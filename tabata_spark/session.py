"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design target (AQE on, dynamic
partition overwrite for per-record upserts, Arrow for the pandas-UDF
boundary) while remaining correct on local[*].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "tabata_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE enabled: runtime coalescing of shuffle partitions, skew-join
      splitting, and dynamic join-strategy switching — the knobs that
      keep one plan valid from sf0.001 to 100 TB.
    - ``partitionOverwriteMode=dynamic``: the reference's ``put()``
      upsert (opset.py:229-260) maps to overwriting only the written
      ``record_id`` partitions.
    - Arrow on: the scipy-parity ``applyInPandas`` path pays batch
      (not row) serialization.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata ts shapes vary by generation: legacy INT64
        # TIMESTAMP(NANOS) (unreadable as timestamp without this conf —
        # read raw nanos) and current naive timestamp[us] (arrives as
        # TIMESTAMP_NTZ). Both are normalized to session-zone TIMESTAMP
        # at the loader (sources.relational._normalize_ts)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
