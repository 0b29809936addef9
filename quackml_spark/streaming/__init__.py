from quackml_spark.streaming.events import (
    read_event_stream,
    run_to_completion,
    sessionize,
    streaming_hourly_aggregate,
    streaming_predict,
    streaming_transform,
)

__all__ = [
    "read_event_stream",
    "streaming_hourly_aggregate",
    "streaming_transform",
    "streaming_predict",
    "sessionize",
    "run_to_completion",
]
