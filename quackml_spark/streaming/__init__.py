from quackml_spark.streaming.events import (
    auto_rollback_on_drift,
    drift_monitor_stream,
    ewma_stream,
    stream_stream_lookback_join,
    streaming_dedup,
    read_event_stream,
    run_to_completion,
    sessionize,
    streaming_hourly_aggregate,
    streaming_predict,
    streaming_transform,
    serve_with_auto_rollback,
)

__all__ = [
    "auto_rollback_on_drift",
    "drift_monitor_stream",
    "serve_with_auto_rollback",
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
