from tabata_spark.streaming.joins import attribution_pairs, attribution_summary
from tabata_spark.streaming.sinks import stream_dedup_append, stream_upsert_parquet
from tabata_spark.streaming.stateful import streaming_out_of_tube
from tabata_spark.streaming.windows import (
    read_events_stream,
    session_agg,
    sessionize_batch,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "attribution_pairs",
    "attribution_summary",
    "read_events_stream",
    "session_agg",
    "sessionize_batch",
    "sliding_agg",
    "stream_dedup_append",
    "stream_upsert_parquet",
    "streaming_out_of_tube",
    "tumbling_agg",
]
