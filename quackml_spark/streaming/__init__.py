from quackml_spark.streaming.events import (
    ewma_stream,
    stream_stream_lookback_join,
    streaming_dedup,
    read_event_stream,
    run_to_completion,
    sessionize,
    streaming_hourly_aggregate,
    streaming_predict,
    streaming_transform,
)

__all__ = [
    "ewma_stream",
    "streaming_dedup",
    "stream_stream_lookback_join",
    "read_event_stream",
    "streaming_hourly_aggregate",
    "streaming_transform",
    "streaming_predict",
    "sessionize",
    "run_to_completion",
]
