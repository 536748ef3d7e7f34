"""Epoch-seconds conversion — the single place that knows how a
timestamp becomes a number.

Every operator that does timestamp arithmetic (durations, gaps, as-of
distances, session boundaries) funnels through ``epoch_s`` so the next
timestamp-type change is a one-line fix here instead of a sweep over
~20 call sites (the round-3 TIMESTAMP_NTZ breakage touched every
inlined ``ts.cast("double")`` in the repo).

Input contract: a session-zone TIMESTAMP column — which is what the
loaders guarantee (sources/relational.py:_normalize_ts normalizes
legacy INT64-nanos and TIMESTAMP_NTZ parquet shapes). ``cast("double")``
on TIMESTAMP yields epoch seconds with microsecond precision,
bit-identical to DuckDB's ``epoch(ts)`` under UTC.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = "Column | str"


def epoch_s(col: Column | str) -> Column:
    """Epoch seconds (double, microsecond precision) of a TIMESTAMP
    column. NOT legal on TIMESTAMP_NTZ — normalize at the loader, not
    at call sites."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def epoch_us(col: Column | str) -> Column:
    """Epoch **microseconds** as BIGINT — the hash-stable encoding for
    timestamp *outputs*. ``unix_micros`` is exact (timestamps are
    stored at µs precision) and matches DuckDB's ``epoch_us(ts)``
    bit-for-bit, with none of the round-to-decimal boundary ambiguity
    of ``round(epoch_s(ts), 3)`` doubles (round-4 w_sessionize red).
    Same loader contract as :func:`epoch_s`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c)


def epoch_diff_s(end: Column | str, start: Column | str) -> Column:
    """``end - start`` in seconds; both session-zone TIMESTAMP."""
    return epoch_s(end) - epoch_s(start)


def duration_h(end: Column | str, start: Column | str) -> Column:
    """``end - start`` in hours."""
    return epoch_diff_s(end, start) / F.lit(3600.0)
