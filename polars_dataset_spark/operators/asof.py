"""As-of join (nearest-key join): polars ``join_asof`` parity.

The reference reaches ``join_asof`` through its full-API delegation
(``/root/reference/polars_dataset.py:61-78``): for each left row, take the
right row with the greatest key ≤ left key (``backward``) or smallest key ≥
left key (``forward``), optionally within ``by`` groups and a ``tolerance``.

Spark has no built-in as-of join. This is the union-sort realization — NOT
a range join:

1. left and right rows are tagged and unioned, aligned on (by, key);
2. one window ``partitionBy(by).orderBy(key, side)`` carries each right
   row's payload to following left rows via ``last(..., ignorenulls=True)``
   (right sorts before left at equal keys, so matches are inclusive);
   ``nearest`` carries both directions — two in-partition sorts over the
   SAME single exchange — and picks the closer match per row (ties go
   backward, same rule as the broadcast path's searchsorted);
3. filter back to left rows; ``tolerance`` nulls out too-distant matches.

Cost profile: one shuffle of |L|+|R| rows keyed by ``by`` plus a sorted
window scan — linear, no candidate explosion, both sides may be arbitrarily
large (the pathological case for the naive range-join formulation). With no
``by`` the window is global (single-partition sort) — inherent to an
ungrouped as-of; prefer passing ``by`` at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_dataset_spark.core import Dataset

__all__ = ["join_asof"]


def _numeric_key(df: DataFrame, name: str):
    """Order-preserving double key: timestamps/dates become epoch seconds
    (so ``tolerance`` is in seconds for time keys), numerics cast plainly."""
    import pyspark.sql.types as T

    dt = df.schema[name].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.unix_micros(F.col(name).cast("timestamp")) / F.lit(1e6)
    return F.col(name).cast("double")


def join_asof(
    left,
    right,
    on: str,
    by=None,
    strategy: str = "backward",
    tolerance: float | None = None,
    right_on: str | None = None,
    suffix: str = "_right",
    method: str = "auto",
    broadcast_limit: int = 1_000_000,
) -> "Dataset | DataFrame":
    """As-of join ``left`` with ``right`` on key ``on`` (``right_on`` if the
    right key is named differently), per ``by`` group, ``backward``,
    ``forward`` or ``nearest``, optionally within ``tolerance`` (in key
    units; timestamps compare as epoch seconds).

    ``method``:

    - ``"auto"`` (default): probe the right side with a bounded collect
      (``limit(broadcast_limit + 1)``); if it fits, take the broadcast
      path, else fall back to ``"sort"``. An as-of right side is almost
      always reference data or a pre-aggregation, so at 100 TB this keeps
      the common case map-only instead of a global sort — without the
      caller having to know the right side's size.
    - ``"sort"``: the union-sort realization described above — both sides
      arbitrarily large, one shuffle on ``by``. NOTE: with no ``by`` this
      is a single-partition global sort over |L|+|R| rows; prefer ``auto``.
    - ``"broadcast"``: collect + broadcast the RIGHT side and answer each
      left row by binary search (``np.searchsorted``) inside
      ``mapInPandas`` — MAP-ONLY: no shuffle, no sort, left side any size.
      The scale path whenever the right side fits in executor memory
      (reference-data / aggregated-dimension joins, the overwhelmingly
      common case); also the only method that avoids a single-partition
      global sort when ``by`` is empty. Raises when the right side
      exceeds ``broadcast_limit`` rows (driver-OOM guard) — pass
      ``method="sort"`` for a genuinely large right side.
    """
    if strategy not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"strategy must be 'backward', 'forward' or 'nearest', got {strategy!r}"
        )
    if method not in ("auto", "sort", "broadcast"):
        raise ValueError(f"method must be 'auto', 'sort' or 'broadcast', got {method!r}")
    if method in ("auto", "broadcast"):
        rp = _collect_right(right, on, by, right_on, broadcast_limit)
        if rp is not None:
            return _join_asof_broadcast(
                left, right, on, by=by, strategy=strategy, tolerance=tolerance,
                right_on=right_on, suffix=suffix, right_pdf=rp,
            )
        if method == "broadcast":
            raise ValueError(
                f"join_asof(method='broadcast'): right side exceeds "
                f"broadcast_limit={broadcast_limit} rows; use method='sort' "
                f"(shuffle-based, both sides arbitrarily large) or raise the limit"
            )
    was_dataset = isinstance(left, Dataset)
    ldf = left.df if isinstance(left, Dataset) else left
    rdf = right.df if isinstance(right, Dataset) else right
    r_on = right_on or on
    by = [by] if isinstance(by, str) else list(by or [])

    payload = [c for c in rdf.columns if c != r_on and c not in by]
    renames = {c: (f"{c}{suffix}" if c in ldf.columns else c) for c in payload}
    lcols = ldf.columns

    l_sel = ldf.select(
        F.lit(1).alias("__side"),
        _numeric_key(ldf, on).alias("__key"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast("double").alias("__rkey"),
        *[F.lit(None).cast(rdf.schema[c].dataType).alias(renames[c]) for c in payload],
    )
    r_sel = rdf.select(
        F.lit(0).alias("__side"),
        _numeric_key(rdf, r_on).alias("__key"),
        *[
            (F.col(c) if c in by else F.lit(None).cast(ldf.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        _numeric_key(rdf, r_on).alias("__rkey"),
        *[F.col(c).alias(renames[c]) for c in payload],
    )
    unioned = l_sel.unionByName(r_sel)

    # ``nearest`` carries BOTH directions over the SAME partitioning —
    # one exchange, two in-partition window sorts — then picks per row
    # whichever match is closer (ties go backward, matching the
    # broadcast path's searchsorted tie rule).
    base = Window.partitionBy(*by) if by else Window.partitionBy()
    wb = base.orderBy(F.col("__key").asc(), F.col("__side").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = base.orderBy(F.col("__key").desc(), F.col("__side").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )

    def _carry(w, tag):
        cols = [F.last("__rkey", ignorenulls=True).over(w).alias(f"__{tag}key")]
        cols += [
            F.last(renames[c], ignorenulls=True).over(w).alias(f"__{tag}_{renames[c]}")
            for c in payload
        ]
        return cols

    sel = ["__side", "__key", *lcols]
    if strategy in ("backward", "nearest"):
        sel += _carry(wb, "b")
    if strategy in ("forward", "nearest"):
        sel += _carry(wf, "f")
    carried = unioned.select(*sel)
    out = carried.filter(F.col("__side") == 1)

    if strategy == "backward":
        mkey = F.col("__bkey")
        mpay = {c: F.col(f"__b_{renames[c]}") for c in payload}
    elif strategy == "forward":
        mkey = F.col("__fkey")
        mpay = {c: F.col(f"__f_{renames[c]}") for c in payload}
    else:
        bkey, fkey = F.col("__bkey"), F.col("__fkey")
        use_b = bkey.isNotNull() & (
            fkey.isNull()
            | (F.abs(F.col("__key") - bkey) <= F.abs(F.col("__key") - fkey))
        )
        mkey = F.when(use_b, bkey).otherwise(fkey)
        mpay = {
            c: F.when(use_b, F.col(f"__b_{renames[c]}")).otherwise(
                F.col(f"__f_{renames[c]}")
            )
            for c in payload
        }

    matched = mkey.isNotNull()
    if tolerance is not None:
        matched = matched & (F.abs(F.col("__key") - mkey) <= F.lit(float(tolerance)))
    out = out.select(
        *lcols,
        *[F.when(matched, mpay[c]).alias(renames[c]) for c in payload],
    )
    if was_dataset:
        return left._rewrap(out)
    return out


def _collect_right(right, on: str, by, right_on: str | None, limit: int):
    """Bounded collect of the as-of right side: select only (by, key,
    payload), take ``limit + 1`` rows, sort driver-side. Returns the sorted
    pandas frame, or ``None`` when the right side exceeds ``limit`` (the
    caller decides: fall back to the shuffle path, or raise). The limit is
    applied BEFORE any ordering so the probe never pays a global sort."""
    rdf = right.df if isinstance(right, Dataset) else right
    r_on = right_on or on
    by = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in rdf.columns if c != r_on and c not in by]
    rp = (
        rdf.select(*by, _numeric_key(rdf, r_on).alias("__k"), *payload)
        .limit(limit + 1)
        .toPandas()
    )
    if len(rp) > limit:
        return None
    return rp.sort_values([*by, "__k"], ignore_index=True, kind="mergesort")


def _join_asof_broadcast(
    left,
    right,
    on: str,
    by=None,
    strategy: str = "backward",
    tolerance: float | None = None,
    right_on: str | None = None,
    suffix: str = "_right",
    right_pdf=None,
):
    """Broadcast binary-search as-of join (see :func:`join_asof`,
    ``method="broadcast"``)."""
    import numpy as np
    from pyspark.sql import types as T

    was_dataset = isinstance(left, Dataset)
    ldf = left.df if isinstance(left, Dataset) else left
    rdf = right.df if isinstance(right, Dataset) else right
    r_on = right_on or on
    by = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in rdf.columns if c != r_on and c not in by]
    renames = {c: (f"{c}{suffix}" if c in ldf.columns else c) for c in payload}

    # NB: not getActiveSession() — that is thread-local and None when the
    # caller runs in a worker thread (e.g. a concurrent benchmark driver)
    spark = ldf.sparkSession
    if right_pdf is not None:
        rp = right_pdf
    else:
        rp = (
            rdf.select(*by, _numeric_key(rdf, r_on).alias("__k"), *payload)
            .orderBy(*by, "__k")
            .toPandas()
        )
    # per-by-group sorted key arrays + aligned payload arrays
    groups: dict = {}
    if by:
        for key_vals, g in rp.groupby(by, sort=False):
            k = key_vals if isinstance(key_vals, tuple) else (key_vals,)
            groups[k] = (g["__k"].to_numpy(np.float64), {c: g[c].to_numpy() for c in payload})
    else:
        groups[()] = (rp["__k"].to_numpy(np.float64), {c: rp[c].to_numpy() for c in payload})
    b_groups = spark.sparkContext.broadcast(groups)

    lcols = ldf.columns
    out_fields = list(ldf.schema.fields) + [
        T.StructField(renames[c], rdf.schema[c].dataType, True) for c in payload
    ]
    out_schema = T.StructType(out_fields)
    if strategy not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"strategy must be 'backward', 'forward' or 'nearest', got {strategy!r}"
        )

    keyed = ldf.withColumn("__k", _numeric_key(ldf, on))

    def pick(keys, kq_rows):
        """Matched right-index per query key + validity mask, per strategy
        (nearest = closer of the backward/forward candidates, ties backward)."""
        if strategy == "backward":
            il = np.searchsorted(keys, kq_rows, side="right") - 1
            valid = il >= 0
        elif strategy == "forward":
            il = np.searchsorted(keys, kq_rows, side="left")
            valid = il < keys.size
        else:
            ib = np.searchsorted(keys, kq_rows, side="right") - 1
            ifw = np.searchsorted(keys, kq_rows, side="left")
            vb, vf = ib >= 0, ifw < keys.size
            db = np.where(vb, np.abs(kq_rows - keys[np.clip(ib, 0, keys.size - 1)]), np.inf)
            dfw = np.where(vf, np.abs(keys[np.clip(ifw, 0, keys.size - 1)] - kq_rows), np.inf)
            il = np.where(db <= dfw, ib, ifw)
            valid = vb | vf
        if tolerance is not None:
            matched = keys[np.clip(il, 0, keys.size - 1)]
            valid = valid & (np.abs(kq_rows - matched) <= tolerance)
        return np.clip(il, 0, keys.size - 1), valid

    def lookup(batches):
        grp = b_groups.value
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            out = pdf.copy()
            kq = pdf["__k"].to_numpy(np.float64)
            n = len(pdf)
            for c in payload:
                out[renames[c]] = np.full(n, None, dtype=object)
            row_groups = (
                pdf.groupby(by, sort=False).indices.items()
                if by
                else [((), np.arange(n))]
            )
            for key_vals, rows_pos in row_groups:
                k = key_vals if isinstance(key_vals, tuple) else (key_vals,)
                if k not in grp or grp[k][0].size == 0:
                    continue
                keys, pay = grp[k]
                il, valid = pick(keys, kq[rows_pos])
                for c in payload:
                    col = out[renames[c]].to_numpy()
                    col[rows_pos[valid]] = pay[c][il[valid]]
                    out[renames[c]] = col
            yield out.drop(columns=["__k"])

    result = keyed.mapInPandas(lookup, schema=out_schema)
    if was_dataset:
        return left._rewrap(result)
    return result
