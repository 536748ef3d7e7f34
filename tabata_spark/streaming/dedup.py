"""Streaming deduplication (north-star extension — the streaming twin
of operators/dedup.py's exact tier).

Three shapes, all watermark-bounded so state cannot grow without
limit on an unbounded stream:

- ``stream_exact_dedup``: first occurrence per content hash within
  the watermark horizon via ``dropDuplicatesWithinWatermark`` — the
  canonical streaming exact-dedup (state per distinct key, expired
  by event time);
- ``stream_dedup_by_key``: dropDuplicates on explicit key columns +
  the event-time column (exactly-once per (key, time) even across
  restarts, since the key set is part of the state store);
- ``stream_seen_filter``: stream-static anti-join against an already
  deduplicated historical corpus (the "have we ever seen this hash"
  backfill join — the static side is broadcast or bucket-joined by
  Catalyst like any batch join).

At 100 TB/day the watermark IS the state bound: state holds one entry
per distinct hash seen within the horizon, and the hash is uniform so
the state store shards evenly across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(
    df: DataFrame, text_col: str = "text", hash_col: str = "content_hash"
) -> DataFrame:
    """md5 content hash (same key the batch exact tier groups on —
    operators/dedup.exact_dedup)."""
    return df.withColumn(hash_col, F.md5(F.col(text_col)))


def stream_exact_dedup(
    stream: DataFrame,
    time_col: str = "ts",
    text_col: str = "text",
    watermark: str = "2 hours",
) -> DataFrame:
    """Keep the first occurrence per content hash within the watermark
    horizon. State expires with the watermark, so memory is bounded by
    the distinct-hash rate × horizon, not by stream length."""
    hashed = with_content_hash(stream, text_col).withWatermark(time_col, watermark)
    return hashed.dropDuplicatesWithinWatermark(["content_hash"])


def stream_dedup_by_key(
    stream: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once per (keys..., event-time) — dropDuplicates with
    the time column in the key, state bounded by the watermark."""
    return stream.withWatermark(time_col, watermark).dropDuplicates(
        [*keys, time_col]
    )


def stream_seen_filter(
    stream: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Drop stream rows whose content hash already exists in a static
    (historical) corpus: stream-static left_anti join. The static side
    follows normal batch join planning (broadcast when small, bucketed
    scan when pre-bucketed by the hash)."""
    hashed = with_content_hash(stream, text_col, hash_col)
    if hash_col not in seen.columns:
        seen = with_content_hash(seen, text_col, hash_col)
    return hashed.join(
        seen.select(hash_col).distinct(), hash_col, "left_anti"
    )
