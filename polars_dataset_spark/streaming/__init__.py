from polars_dataset_spark.streaming.ops import (
    read_events_stream,
    windowed_agg,
    session_agg,
    sessionize_batch,
    run_stream_to_memory,
)

__all__ = [
    "read_events_stream",
    "windowed_agg",
    "session_agg",
    "sessionize_batch",
    "run_stream_to_memory",
]
