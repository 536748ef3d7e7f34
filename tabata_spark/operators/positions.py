"""Positional window columns — reference W1-W4 (SURVEY §2.5).

The reference adds per-record position features LEN/REV/PERCENT
(instants.py:306-311,516-520) and a TIME regressor (tubes.py:215,328).
All are rank/count expressions over the record window — shuffle-free
once the data is partitioned by record_id, and whole-stage-codegen'd
(no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Record-local ordered window (the engine's fundamental frame).
def record_window(order: str = "seq") -> Window:
    return Window.partitionBy("record_id").orderBy(order)


def record_frame() -> Window:
    """Unbounded record frame for per-record constants (count/max/last)."""
    return (
        Window.partitionBy("record_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )


def len_col() -> Column:
    """LEN: absolute 0-based row position (instants.py:306-307)."""
    return (F.row_number().over(record_window()) - F.lit(1)).cast("double")


def rev_col() -> Column:
    """REV: rows-from-end, ``np.flip(arange)`` (instants.py:307,518)."""
    return (F.count(F.lit(1)).over(record_frame()) - F.row_number().over(record_window())).cast(
        "double"
    )


def percent_col() -> Column:
    """PERCENT: relative position in [0,1] (instants.py:307,520).

    Guards the single-row record (n-1 == 0 -> 0.0)."""
    n = F.count(F.lit(1)).over(record_frame())
    pos = F.row_number().over(record_window()) - F.lit(1)
    return F.when(n > 1, pos.cast("double") / (n - F.lit(1)).cast("double")).otherwise(
        F.lit(0.0)
    )


def with_positions(
    df: DataFrame,
    len_name: str = "LEN[pts]",
    rev_name: str = "REV[pts]",
    percent_name: str = "PERCENT[%]",
) -> DataFrame:
    """Add all three position channels in one pass (one window spec —
    a single shuffle on record_id, then codegen)."""
    return (
        df.withColumn(len_name, len_col())
        .withColumn(rev_name, rev_col())
        .withColumn(percent_name, percent_col())
    )
