from tabata_spark.streaming.joins import attribution_pairs, attribution_summary
from tabata_spark.streaming.sinks import (
    stream_dedup_append,
    stream_rollup_maintain,
    stream_upsert_parquet,
)
from tabata_spark.streaming.stateful import (
    batch_cusum,
    streaming_cusum,
    streaming_out_of_tube,
)
from tabata_spark.streaming.windows import (
    read_events_stream,
    session_agg,
    session_sequence_agg,
    sessionize_batch,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "attribution_pairs",
    "batch_cusum",
    "session_sequence_agg",
    "stream_rollup_maintain",
    "streaming_cusum",
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
