"""Incremental streaming regrid: the flagship per-trace spline operator as
a stateful streaming transformation (SURVEY §7 Phase 4, "incremental
regrid ... via applyInPandasWithState").

Each key (trace) carries its observed samples as state (two double
arrays); every micro-batch appends its points and re-emits the trace
interpolated onto the fixed grid. Late/out-of-order samples are handled
naturally — the kernel re-sorts per evaluation — so the emitted grid rows
always reflect ALL samples seen so far (update-mode semantics).

State size is O(points per trace) — bounded by the physical sweep length,
the same invariant that makes batch regrid's groups small. For unbounded
traces, cap retention with ``max_points`` (keeps the newest samples by
index order).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from polars_dataset_spark.kernels import interp_trace

__all__ = ["regrid_stream"]


def regrid_stream(
    events: DataFrame,
    grid,
    key_col: str,
    index_col: str,
    value_col: str,
    method: str = "cubic",
    max_points: int | None = None,
) -> DataFrame:
    """Continuously re-interpolate ``value_col`` over ``index_col`` onto
    ``grid`` per ``key_col`` as samples stream in.

    Output (update mode): one row per (key, grid point) per trigger with
    the current interpolation and the number of samples it is based on.
    """
    grid = np.asarray(grid, dtype=np.float64)
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField(index_col, T.DoubleType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("n_samples", T.LongType()),
        ]
    )
    state_schema = "xs ARRAY<DOUBLE>, ys ARRAY<DOUBLE>"

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            xs_list, ys_list = state.get
            xs = list(xs_list)
            ys = list(ys_list)
        else:
            xs, ys = [], []
        for pdf in pdfs:
            xs.extend(float(v) for v in pdf[index_col])
            ys.extend(float(v) for v in pdf[value_col])
        if max_points is not None and len(xs) > max_points:
            order = np.argsort(xs)[-max_points:]
            xs = [xs[i] for i in order]
            ys = [ys[i] for i in order]
        state.update((xs, ys))
        vals = interp_trace(np.asarray(xs), np.asarray(ys), grid, method=method)
        yield pd.DataFrame(
            {
                "key": np.repeat(key[0], grid.size),
                index_col: grid,
                value_col: vals,
                "n_samples": np.repeat(len(xs), grid.size),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
