"""Crawl-budget apportionment — largest-remainder (Hamilton) quotas.

A crawl cycle has a global page budget; each domain (or source, or
shard) gets a share proportional to its weight — frontier size,
domain-prior quality, token yield. Proportional shares are fractional;
a real scheduler needs INTEGERS that sum to EXACTLY the budget — round
half the quotas up and the fetch fleet over-commits, round down and
budget is left on the floor. The classic fix is Hamilton's
largest-remainder method: every key gets ``floor(exact_share)``, and
the leftover ``B - Σfloor`` units go to the largest fractional
remainders (key-ascending tie-break for determinism).

The distributed catch is the remainder RANKING: a naive
``row_number() OVER (ORDER BY rem DESC)`` is a single-partition sort
of the whole key set. :func:`allocate_budget` rides the repo's
two-pass distributed prefix sum instead (functions/packing
``_global_prefix_sum`` — range partitions + per-partition offsets, the
same machinery as positional slicing), so apportioning 100 M domains
costs one range exchange, never a one-partition sort. The two scalar
totals (Σweight, Σfloor) are 1-row broadcast crossJoins — the bounded
q124-class shape the plan audit allowlists.

Reference envelope: `/root/reference/polars_dataset.py` has no crawl
surface; driver-mandated pipeline extension family (SURVEY §2.4),
composing with domain_quality_profile / schedule_frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["allocate_budget"]


def allocate_budget(
    df: DataFrame,
    budget: int,
    key_col: str = "key",
    weight_col: str = "weight",
) -> DataFrame:
    """Integer quotas summing to EXACTLY ``budget``, proportional to
    ``weight_col`` by the largest-remainder method: ``(key, weight,
    quota)``. Non-positive/null weights are dropped (no share).
    Determinism: equal remainders break key-ascending. The ranking is
    the two-pass distributed prefix sum — eager at call time (two
    small jobs), like every positional operator in the repo."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    from polars_dataset_spark.functions.packing import _global_prefix_sum
    from polars_dataset_spark.session import ensure_parallelism

    base = (
        ensure_parallelism(df)
        .select(
            F.col(key_col).alias("key"),
            F.col(weight_col).cast("double").alias("weight"),
        )
        .filter(F.col("weight") > 0)
    )
    total = base.agg(F.sum("weight").alias("__tw"))
    d = base.crossJoin(F.broadcast(total))
    d = d.withColumn(
        "__exact", F.lit(float(budget)) * F.col("weight") / F.col("__tw")
    )
    d = d.withColumn("__fl", F.floor("__exact").cast("long"))
    d = d.withColumn("__rem", F.col("__exact") - F.col("__fl"))
    floors = d.agg(F.sum("__fl").alias("__fs"))
    d = (
        d.crossJoin(F.broadcast(floors))
        .withColumn("__negrem", -F.col("__rem"))
        .withColumn("__one", F.lit(1))
    )
    parts = max(d.sparkSession.sparkContext.defaultParallelism, 1)
    ranked = _global_prefix_sum(d, "__one", ["__negrem", "key"], parts)
    return ranked.select(
        "key",
        "weight",
        (
            F.col("__fl")
            + F.when(
                F.col("__cum") <= F.lit(budget) - F.col("__fs"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("quota"),
    )
