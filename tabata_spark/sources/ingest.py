"""Ingest shims: HDF5 (the reference's storage, opset.py:74-119),
CSV/JSON directories of per-record files, and generic long-frame
normalization.

HDF5 needs pytables, which this environment does not ship — the shim
is imported lazily and raises a clear error if the dependency is
missing; everything else is pure Spark readers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tabata_spark.core.signalset import SignalSet


def from_hdf5(spark: SparkSession, path: str, phase: str | None = None) -> SignalSet:
    """Read a reference-format HDF5 Opset store (one key per record,
    pandas frames) into a SignalSet. Requires pytables."""
    import pandas as pd

    try:
        with pd.HDFStore(path, mode="r") as store:
            keys = [k.lstrip("/") for k in store.keys()]
            records = {k: store.get(k) for k in keys}
    except ImportError as e:  # pytables missing
        raise ImportError(
            "HDF5 ingest needs the 'tables' package (not installed in this "
            "environment); convert the store to parquet elsewhere or install pytables"
        ) from e
    return SignalSet.from_records(spark, records, phase=phase)


def from_record_files(
    spark: SparkSession,
    path_glob: str,
    fmt: str = "csv",
    ts_col: str | None = None,
    record_from_filename: bool = True,
    **options,
) -> SignalSet:
    """One file per record (CSV or JSON lines): read the whole glob in
    one distributed scan, derive record_id from the file name, and
    synthesize seq per record. No driver-side looping — at 100 TB this
    is a single partitioned read."""
    reader = spark.read.options(**({"header": "true", "inferSchema": "true"} | options))
    df = reader.format(fmt).load(path_glob)
    if record_from_filename:
        df = df.withColumn(
            "record_id",
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.[A-Za-z]+$", 1),
        )
    order = F.col(ts_col) if ts_col else F.monotonically_increasing_id()
    w = Window.partitionBy("record_id").orderBy(order)
    df = df.withColumn("seq", (F.row_number().over(w) - F.lit(1)).cast("long"))
    if ts_col and ts_col != "ts":
        df = df.withColumnRenamed(ts_col, "ts")
    return SignalSet(df)


def normalize_long(
    df: DataFrame,
    record_col: str,
    ts_col: str | None = None,
    seq_col: str | None = None,
) -> SignalSet:
    """Adapt an arbitrary long-layout frame to the engine's schema:
    rename the record key, keep/synthesize seq, keep ts if present."""
    out = df.withColumnRenamed(record_col, "record_id")
    if seq_col and seq_col != "seq":
        out = out.withColumnRenamed(seq_col, "seq")
    if "seq" not in out.columns:
        order = F.col(ts_col) if ts_col else F.monotonically_increasing_id()
        w = Window.partitionBy("record_id").orderBy(order)
        out = out.withColumn("seq", (F.row_number().over(w) - F.lit(1)).cast("long"))
    if ts_col and ts_col != "ts":
        out = out.withColumnRenamed(ts_col, "ts")
    return SignalSet(out)


def datafile(name: str = "") -> str:
    """Reference datafile helper (opset.py:465-467): resolve a bundled
    example-data path."""
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    return os.path.join(base, name) if name else base
