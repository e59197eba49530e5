"""Custom stateful streaming operator: incremental per-trace statistics.

The reference has no streaming story at all; this is the driver-mandated
extension (SURVEY §7 Phase 4) built on ``applyInPandasWithState`` — the
Structured Streaming primitive for arbitrary per-key state. Each key
(trace / user) carries a fixed-width state row (count, sum, sum of
squares, min, max); every micro-batch folds its rows into the state and
emits the updated running statistics.

This is the incremental twin of ``groupBy(keys).agg(...)``: the batch
aggregation pins the semantics (count/sum/mean/variance/min/max must match
a batch run over the same prefix), while the stateful form bounds memory
to O(|keys|) regardless of stream length — the 100 TB-stream shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_trace_stats", "RUNNING_STATS_SCHEMA", "RUNNING_STATE_SCHEMA"]

RUNNING_STATE_SCHEMA = "n LONG, s DOUBLE, s2 DOUBLE, mn DOUBLE, mx DOUBLE"

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("var", T.DoubleType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
    ]
)


def running_trace_stats(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Running count/sum/mean/variance/min/max of ``value_col`` per
    ``key_col`` over a stream (or a batch DataFrame's grouped iterator in
    tests via the same fold function)."""

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, s2, mn, mx = state.get
        else:
            n, s, s2, mn, mx = 0, 0.0, 0.0, float("inf"), float("-inf")
        for pdf in pdfs:
            v = pdf[value_col].dropna()
            if len(v):
                n += int(len(v))
                s += float(v.sum())
                s2 += float((v * v).sum())
                mn = min(mn, float(v.min()))
                mx = max(mx, float(v.max()))
        state.update((n, s, s2, mn, mx))
        if n == 0:
            return
        mean = s / n
        var = max(s2 / n - mean * mean, 0.0)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "sum": [s],
                "mean": [mean],
                "var": [var],
                "min": [mn],
                "max": [mx],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
