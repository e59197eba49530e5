"""Sequence packing: assign documents to fixed token-budget bins.

LLM pretraining concatenates documents into fixed-length context
windows ("packing"); the shuffle-free bookkeeping for that is: order
the documents of a stream deterministically, take the running token
count, and derive for each document the window it starts in and the
offset where it starts — concat-and-chunk packing (documents may
straddle a window boundary; the trainer splits them). This is the
standard streaming-packing layout, and unlike first-fit bin packing it
is embarrassingly parallel and exactly expressible as a prefix sum.

One shuffle (the per-stream window sort); all arithmetic stays in
whole-stage codegen. At 100 TB the stream key (e.g. ``lang`` or a
shard id) bounds each window partition; a single global stream would
serialize — callers wanting one stream should pre-shard and offset by
per-shard totals (one extra tiny aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str,
    order_col: str,
    stream_cols: list[str] | None = None,
) -> DataFrame:
    """Add packing coordinates per document: ``cum_tokens`` (running
    total INCLUDING this doc), ``bin`` (0-based window index where the
    doc starts) and ``offset`` (token position within that window),
    ordering each stream by ``order_col``.

    A document starting at global token position p (= running total
    before it) lands in window ``p // budget`` at offset ``p % budget``.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    part = [F.col(c) for c in (stream_cols or [])]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    before = cum - F.col(tokens_col)
    return df.withColumns(
        {
            "cum_tokens": cum,
            "bin": (before / budget).cast("long"),
            "offset": before % budget,
        }
    )
