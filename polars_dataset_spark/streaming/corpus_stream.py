"""Streaming corpus ingestion: the §2.4 cleaning pipeline expressed once
and run over EITHER a batch DataFrame or a Structured Streaming source.

This is the incremental-ingestion twin of ``functions.pipeline
.clean_corpus``: a crawler feed lands documents continuously; quality and
language gates are stateless map stages (identical code paths in both
modes), and exact dedup becomes watermark-bounded streaming state
(``dropDuplicatesWithinWatermark``) — state size is O(ingest rate ×
watermark horizon), never O(corpus), which is what makes the operator
viable on an unbounded 100 TB/day feed. Fuzzy (MinHash) dedup is
deliberately NOT part of the streaming path: banded LSH needs a
corpus-global self-join, so production pipelines run it as a periodic
batch compaction over the already-exactly-deduped stream output — compose
``functions.dedup.minhash_dedup`` over this operator's sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_dataset_spark.functions.text import (
    with_language_id,
    with_quality_score,
    with_token_count,
)

__all__ = ["read_documents_stream", "clean_stream", "trending_tokens"]


def read_documents_stream(spark, path: str) -> DataFrame:
    """Open a documents parquet (file or directory) as a file-source
    stream. Schema comes from a one-off batch read of the same path (a
    streaming source cannot infer); a single-file path streams its parent
    directory with a glob filter, matching ``read_events_stream``."""
    import os

    schema = spark.read.parquet(path).schema
    glob_filter = None
    if path.endswith(".parquet") and os.path.isfile(path):
        glob_filter = os.path.basename(path)
        path = os.path.dirname(path)
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    return reader.parquet(path)


def clean_stream(
    docs: DataFrame,
    ts_col: str | None = None,
    text_col: str = "text",
    min_quality: float = 0.5,
    watermark: str = "10 minutes",
    token_mode: str = "whitespace",
) -> DataFrame:
    """Quality filter → language id → exact text dedup → token count.

    On a batch frame, dedup keeps one arbitrary row per normalized text
    (``dropDuplicates`` — same survivor SET of texts as the batch
    ``exact_dedup``). On a streaming frame, ``ts_col`` is required: the
    watermark bounds dedup state, and re-arrivals of a text within the
    horizon are dropped exactly-once into the sink."""
    staged = with_quality_score(docs, text_col).filter(F.col("quality") >= min_quality)
    staged = with_language_id(staged, text_col)
    staged = staged.withColumn(
        "__text_key", F.xxhash64(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "))
    )
    if docs.isStreaming:
        if ts_col is None:
            raise ValueError("streaming clean_stream requires ts_col for the watermark")
        staged = staged.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__text_key"]
        )
    else:
        staged = staged.dropDuplicates(["__text_key"])
    return with_token_count(staged.drop("__text_key"), text_col, mode=token_mode)


def trending_tokens(
    docs: DataFrame,
    ts_col: str,
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-window token frequencies over a document feed — the monitoring
    signal behind "trending terms" dashboards. Explode is stateless; the
    windowed count is the only stateful stage (watermark-bounded). Emits
    ``(window_start, window_end, token, n)``; ranking the tiny per-window
    top-k happens downstream of the sink (the aggregate, not the rank, is
    the part that must scale)."""
    tok = docs.select(
        F.col(ts_col), F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    if docs.isStreaming:
        tok = tok.withWatermark(ts_col, watermark)
    return (
        tok.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("token"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "token",
            "n",
        )
    )
