from tabata_spark.streaming.stateful import streaming_out_of_tube
from tabata_spark.streaming.windows import (
    read_events_stream,
    session_agg,
    sessionize_batch,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "read_events_stream",
    "session_agg",
    "sessionize_batch",
    "sliding_agg",
    "streaming_out_of_tube",
    "tumbling_agg",
]
