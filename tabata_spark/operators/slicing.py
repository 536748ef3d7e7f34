"""Positional slicing & membership joins — reference J1/J3/P8.

The reference slices each record at per-record *instants* (row
positions) with pandas ``iloc`` (instants.py:583-652: ``left`` at
600-601, ``right`` at 624-625, ``between`` at 647-649) and flags rows
by index membership against a second set (``highlight``,
tubes.py:41-70). Relational form:

- instants live in a tiny side table ``(record_id, seq)`` —
  broadcast-joined (SURVEY §4: these tables are O(records), always
  broadcastable, so the big fact side never shuffles);
- a slice is then one pushdown-friendly filter on ``seq``.

At 100 TB this is the classic big-fact × small-dim pattern: broadcast
hash join, no shuffle of the signal data, and the seq filter prunes
row groups via Parquet min/max stats when materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _joined(df: DataFrame, instants: DataFrame, seq_name: str) -> DataFrame:
    side = F.broadcast(instants.select("record_id", F.col("seq").alias(seq_name)))
    return df.join(side, "record_id", "inner")


def left_of(df: DataFrame, instants: DataFrame, strict: bool = True) -> DataFrame:
    """Rows before the record's instant: ``df.iloc[:i]``
    (instants.py:600-601). Records absent from ``instants`` are dropped
    (reference computes an instant for every record before slicing).
    """
    out = _joined(df, instants, "__cut")
    cond = F.col("seq") < F.col("__cut") if strict else F.col("seq") <= F.col("__cut")
    return out.filter(cond).drop("__cut")


def right_of(df: DataFrame, instants: DataFrame) -> DataFrame:
    """Rows from the instant on: ``df.iloc[i:]`` (instants.py:624-625)."""
    out = _joined(df, instants, "__cut")
    return out.filter(F.col("seq") >= F.col("__cut")).drop("__cut")


def between(df: DataFrame, left: DataFrame, right: DataFrame) -> DataFrame:
    """Rows in ``[left, right)`` per record: ``df.iloc[i:j]``
    (instants.py:647-649) — an interval join against per-record bounds.
    """
    lo = F.broadcast(left.select("record_id", F.col("seq").alias("__lo")))
    hi = F.broadcast(right.select("record_id", F.col("seq").alias("__hi")))
    return (
        df.join(lo, "record_id")
        .join(hi, "record_id")
        .filter((F.col("seq") >= F.col("__lo")) & (F.col("seq") < F.col("__hi")))
        .drop("__lo", "__hi")
    )


def highlight(
    origin: DataFrame,
    extract: DataFrame,
    flag: str = "INTERVAL",
    on: tuple[str, str] = ("record_id", "ts"),
) -> DataFrame:
    """Membership flag — reference ``highlight`` (tubes.py:41-70):
    ``df[flag] = np.isin(df.index, extract.index)`` per record.

    Left join against the distinct extract keys + coalesce(false).
    The extract side is typically a phase slice of the same set —
    distinct keys only, and broadcast when small.
    """
    keys = extract.select(*on).distinct().withColumn(flag, F.lit(True))
    out = origin.join(F.broadcast(keys), list(on), "left")
    return out.withColumn(flag, F.coalesce(F.col(flag), F.lit(False)))


def phase_extract(df: DataFrame, phase: str) -> DataFrame:
    """The ``_E`` derived set: rows where the phase column holds
    (tubes.py:57-59)."""
    return df.filter(F.col(f"`{phase}`"))
