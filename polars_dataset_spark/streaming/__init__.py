from polars_dataset_spark.streaming.ops import (
    read_events_stream,
    windowed_agg,
    session_agg,
    sessionize_batch,
    run_stream_to_memory,
)
from polars_dataset_spark.streaming.stateful import running_trace_stats

__all__ = [
    "read_events_stream",
    "windowed_agg",
    "session_agg",
    "sessionize_batch",
    "run_stream_to_memory",
    "running_trace_stats",
]
