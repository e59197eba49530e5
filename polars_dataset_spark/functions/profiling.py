"""Key-distribution profiling: the measurement behind every skew
decision in this package.

``operators/skew.py`` salts joins and AQE splits skewed partitions, but
both need to know WHICH keys are hot — guessing wastes either shuffle
width (salting uniform keys) or wall-clock (not salting the one key
holding 40% of the table). ``key_skew_profile`` measures it:

- ONE pass over the input: every profiled column's value is packed into
  an exploded ``(col_name, value)`` stream, so profiling k columns
  costs one instance-scale shuffle (map-side combined) — not k separate
  jobs/scans;
- the per-(col, value) count table then collapses per column to
  ``n_rows``, ``n_distinct``, the heaviest key and its share, and
  ``skew_factor`` = heaviest-key count ÷ mean-key count (1.0 = uniform;
  ≥ the AQE skew threshold ⇒ salt or let AQE split);
- the heaviest key is chosen DETERMINISTICALLY (max count, ties broken
  by max value string) via a struct max — so the result is stable
  across partitionings and restatable in SQL.

At 100 TB: the explode multiplies rows by k before the combine — for
wide profiling (k ≫ 4), run on a ``hash_sample`` first; key *shares*
concentrate fast (the heavy-hitter keys a skew decision cares about are
exactly the ones a 1% sample cannot miss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "key_skew_profile",
    "column_profile",
    "k_anonymity_audit",
    "numeric_outliers",
]


def key_skew_profile(
    df: DataFrame,
    cols: "list[str]",
    null_token: str = "<null>",
    share_round: int = 6,
) -> DataFrame:
    """Per-column key-distribution profile: one row per profiled column
    with ``(col_name, n_rows, n_distinct, top1_key, top1_cnt,
    top1_share, skew_factor)``. Values are profiled as strings
    (``null_token`` stands in for NULL so it participates like any
    key — a NULL-heavy join key is the classic hidden skew)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.coalesce(F.col(c).cast("string"), F.lit(null_token)).alias("value"),
            )
            for c in cols
        ]
    )
    counts = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.col_name", "p.value")
        .groupBy("col_name", "value")
        .agg(F.count("*").alias("cnt"))
    )
    top = counts.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_distinct"),
        F.max(F.struct(F.col("cnt").alias("cnt"), F.col("value").alias("value"))).alias(
            "__top"
        ),
    )
    return top.select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("__top.value").alias("top1_key"),
        F.col("__top.cnt").cast("long").alias("top1_cnt"),
        F.round(
            F.col("__top.cnt").cast("double") / F.col("n_rows").cast("double"),
            share_round,
        ).alias("top1_share"),
        F.round(
            F.col("__top.cnt").cast("double")
            * F.col("n_distinct").cast("double")
            / F.col("n_rows").cast("double"),
            4,
        ).alias("skew_factor"),
    )


def column_profile(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Data-quality profile: one row per column with ``(col_name,
    n_rows, n_null, null_frac, n_distinct, min_value, max_value)`` —
    min/max computed in the column's NATIVE ordering, then rendered as
    strings (so a numeric column profiles numerically, not
    lexicographically). ``n_distinct`` is exact and excludes NULL.

    Shape: ONE aggregation pass over the scan — all columns' aggregates
    ride the same job (multiple exact distincts plan via Spark's expand
    operator: one shuffle, k-fold expansion — fine for profiling runs;
    for k ≫ 10 on petabyte inputs switch to approx_count_distinct).
    The single wide row then unpivots driver-free via stack()."""
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    aggs = [F.count("*").alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{i}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{i}, __dist_{i}, __min_{i}, __max_{i}"
        for i, c in enumerate(cols)
    )
    tall = wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_null, n_distinct, min_value, max_value)",
    )
    return tall.select(
        "col_name",
        F.col("__n").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.round(F.col("n_null") / F.col("__n"), 6).alias("null_frac"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def k_anonymity_audit(
    df: DataFrame, qi_cols: "list[str]", k: int = 10
) -> DataFrame:
    """Privacy audit: group by the quasi-identifier columns and flag
    every equivalence class smaller than ``k`` — the groups whose
    members a linker could re-identify. Returns one row per class:
    ``(*qi_cols, class_size, at_risk)``. One map-side-combined
    shuffle; join the result back on the QI columns to tag or suppress
    the at-risk rows."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return df.groupBy(*qi_cols).agg(
        F.count("*").cast("long").alias("class_size")
    ).withColumn("at_risk", F.col("class_size") < k)


def numeric_outliers(
    df: DataFrame,
    col: str,
    c: float = 3.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Robust (median/MAD) outlier flags for a numeric column — the
    data-quality gate that survives the outliers it is looking for
    (mean/stddev z-scores are dragged by the very rows they should
    flag; the median and the median absolute deviation have a 50%
    breakdown point — Hampel's rule, public).

    Two exact-percentile aggregations (median of ``col``, then median
    of ``|col - median|``) each reduce to ONE scalar row that joins
    back by broadcast cross join — no corpus-scale re-shuffle, and the
    flag itself is map-only. On integer input both medians are dyadic
    (an int or a .5 midpoint) and ``c`` defaults to 3.5 = 7/2, so
    ``|x - med| > c * mad`` compares exact doubles — the q198 oracle
    replays every column bit-for-bit.

    Returns ``(id_col, col, median, mad, deviation, is_outlier)``.
    At 100 TB, swap ``percentile`` for ``percentile_approx`` (the flags
    become approximate with it — documented tradeoff, not the default).
    """
    med_row = df.agg(F.expr(f"percentile({col}, 0.5)").alias("__med"))
    with_med = df.select(F.col(id_col), F.col(col)).crossJoin(F.broadcast(med_row))
    mad_row = with_med.agg(
        F.expr(f"percentile(abs({col} - __med), 0.5)").alias("__mad")
    )
    return (
        with_med.crossJoin(F.broadcast(mad_row))
        .withColumn("deviation", F.abs(F.col(col) - F.col("__med")))
        .select(
            id_col,
            col,
            F.col("__med").alias("median"),
            F.col("__mad").alias("mad"),
            "deviation",
            (F.col("deviation") > F.lit(c) * F.col("__mad")).alias("is_outlier"),
        )
    )
