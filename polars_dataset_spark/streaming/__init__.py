from polars_dataset_spark.streaming.ops import (
    interval_join,
    read_events_stream,
    windowed_agg,
    session_agg,
    sessionize_batch,
    stream_dedup,
    run_stream_to_memory,
    stream_neardup_filter,
    stream_heavy_hitters,
    stream_image_filter,
    stream_audio_filter,
    stream_video_filter,
)
from polars_dataset_spark.streaming.corpus_stream import (
    clean_stream,
    read_documents_stream,
    trending_tokens,
)
from polars_dataset_spark.streaming.stateful import running_trace_stats
from polars_dataset_spark.streaming.regrid_stream import regrid_stream

__all__ = [
    "clean_stream",
    "read_documents_stream",
    "trending_tokens",
    "interval_join",
    "regrid_stream",
    "read_events_stream",
    "windowed_agg",
    "session_agg",
    "sessionize_batch",
    "stream_dedup",
    "run_stream_to_memory",
    "stream_neardup_filter",
    "stream_heavy_hitters",
    "stream_image_filter",
    "stream_audio_filter",
    "stream_video_filter",
    "running_trace_stats",
]
