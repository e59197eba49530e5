"""Heavy hitters over an unbounded-cardinality column: Misra–Gries
prefilter + exact candidate count.

The third sketch in the engine's scale family (beside the
Greenwald–Khanna quantile sketch, q78, and HyperLogLog++ cardinality,
q105): find every item whose frequency exceeds ``phi·n`` without a
full-cardinality shuffle. ``groupBy(col).count()`` over 100 TB of
free-text tokens shuffles BILLIONS of distinct keys to count the
handful that matter; the sketch path shuffles only candidate items.

Two phases, both with hard guarantees (Misra–Gries 1982; merge rule and
error bound from Agarwal et al., "Mergeable Summaries", PODS 2012 —
both public):

1. **Prefilter** (map-only): each partition keeps a ⌈1/phi⌉−1-counter
   MG summary (``mapInPandas``; merge batch value_counts into the
   summary, compress by subtracting the (k+1)-th largest counter).
   Per-partition output ≤ k rows. Summed across partitions, a
   counter underestimates the true count by at most ``phi·n``, so
   every item with true frequency > ``phi·n`` has a positive summed
   counter → the candidate set (≤ k·partitions items) is a SUPERSET
   of the true heavy hitters.
2. **Exact verify**: count ONLY the candidates (broadcast semi-join
   prefilter before the aggregation — the same reduce-before-shuffle
   shape as the bitset semi-join, operators/bloom.py) and keep items
   with exact count > ``phi·n``.

The output is therefore EXACT (deterministic, value-oracle-able), while
the shuffle volume is bounded by the candidate set instead of the
distinct-key cardinality.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["heavy_hitters", "mg_candidates", "merge_mg_summaries"]


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition k-counter Misra–Gries summaries → one row per
    (partition, surviving item) with its residual counter. Union of the
    item sets is a superset of every item with frequency > n/(k+1)."""
    schema = T.StructType(
        [T.StructField("item", T.StringType()), T.StructField("est", T.LongType())]
    )

    def gen(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                # mergeable-summaries compress: subtract the (k+1)-th
                # largest counter, drop the non-positive
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - sub for i, c in counters.items() if c > sub}
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est": list(counters.values())}
            )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        gen, schema=schema
    )


def merge_mg_summaries(
    summaries: DataFrame, k: int, item_col: str = "item", est_col: str = "est"
) -> DataFrame:
    """Combine any number of Misra–Gries summaries into one k-counter
    summary (Agarwal et al. merge rule): sum counters itemwise, then
    subtract the (k+1)-th largest combined counter and drop the
    non-positive. The error bound telescopes — the merged summary's
    counters underestimate true counts by at most n_total/(k+1).

    The itemwise sum is one aggregation over ≤ k·n_summaries rows; the
    (k+1)-th largest is a bounded ``limit(k+1)`` collect (k+1 rows to
    the driver, never data-scale). Result ≤ k rows.

    The combined summary is ``localCheckpoint``-ed (bounded:
    ≤ k·n_summaries rows however big the data was) so the threshold
    collect and the caller's consumption execute the upstream summary
    pipeline ONCE — without it, the per-partition MG pass ran twice per
    call (measured 2× per-micro-batch cost in the streaming path)."""
    combined = (
        summaries.groupBy(item_col)
        .agg(F.sum(est_col).alias(est_col))
        .localCheckpoint(eager=True)
    )
    top = combined.orderBy(F.col(est_col).desc()).limit(k + 1).collect()
    if len(top) <= k:
        return combined
    sub = int(top[k][est_col])
    return combined.filter(F.col(est_col) > sub).withColumn(
        est_col, F.col(est_col) - sub
    )


def heavy_hitters(
    df: DataFrame, col: str, phi: float = 0.01, out_col: str = "cnt"
) -> DataFrame:
    """All items of ``col`` with exact frequency > ``phi``·n (n = number
    of non-null rows), computed with the MG-prefilter + exact-verify
    shape described in the module docstring. Returns ``(item, cnt)``,
    exact and deterministic."""
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    k = math.ceil(1.0 / phi) - 1
    vals = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    cand = mg_candidates(vals, "item", k).select("item").distinct()
    # candidate set is tiny (≤ k·partitions) → broadcast semi-join prunes
    # the stream BEFORE the counting shuffle
    counted = (
        vals.join(F.broadcast(cand), on="item", how="left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias(out_col))
    )
    total = vals.agg(F.count(F.lit(1)).alias("__n"))
    return (
        counted.crossJoin(F.broadcast(total))  # 1-row scalar frame
        .filter(F.col(out_col) > F.lit(phi) * F.col("__n"))
        .drop("__n")
    )
