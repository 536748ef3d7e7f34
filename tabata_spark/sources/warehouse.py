"""Bucketed relational warehouse — co-located fact-fact joins.

The signal store already has a bucketed layout (core/signalset.py
save_bucketed: zero-exchange window pipelines). This is the
relational twin for the TPC-H-shaped side of the engine: persist
fact tables bucketed (and sorted) by their join key so recurring
fact-fact joins — lineitem⋈orders on orderkey is THE recurring join
of every order-level analysis — run with NO shuffle of either side.

At 100 TB this is the difference between re-shuffling 100 TB per
query and reading co-located buckets: both scans report
``hashpartitioning(key, n)`` as their output partitioning, Catalyst
drops the Exchange on both sides, and with matching ``sortBy`` the
sort before SortMergeJoin disappears too. Pick ``num_buckets`` on the
order of cluster cores (buckets are the parallelism floor), and keep
it IDENTICAL on both tables — mismatched bucket counts re-shuffle one
side.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry AND any orphaned warehouse directory: a
    fresh session's in-memory catalog forgets managed tables, but
    their directories survive, and saveAsTable then fails with
    LOCATION_ALREADY_EXISTS."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{wh.path}/{table.split('.')[-1]}", ignore_errors=True)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session
    catalog. ``sortBy(key)`` makes the downstream sort-merge join
    sort-free as well as shuffle-free."""
    _drop_table_and_location(df.sparkSession, table)
    w = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucket_fact_tables(
    spark: SparkSession,
    tables: dict[str, tuple[DataFrame, str]],
    num_buckets: int = 8,
) -> dict[str, DataFrame]:
    """Bucket several tables — ``{table_name: (df, join_key)}`` — with
    ONE shared bucket count so equi-joins between any two of them on
    their keys are exchange-free. Returns the re-loaded frames."""
    for name, (df, key) in tables.items():
        write_bucketed_table(df, name, key, num_buckets)
    return {name: spark.table(name) for name in tables}
