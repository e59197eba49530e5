"""Z-order (Morton) clustered parquet writes for multi-column data skipping.

Partition pruning helps one column; sorting helps one column. When two
query predicates matter (e.g. time AND key), interleaving the bits of
both columns' QUANTILE bucket ids gives a single sort key whose ranges
are compact in every dimension at once — each output file then covers a
narrow min/max band of BOTH columns, and any engine's row-group /
file-level min-max statistics can skip most files for predicates on
either column. This is the same layout trick Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY``; here it is built from public primitives:

1. ``approxQuantile`` over ALL columns in one scan → bucket edges
   (driver scalars, bounded by the bucket count — never data rows).
2. Bucket id per column via a codegen'd CASE chain; bit-interleave into
   the Morton key with shift/or expressions — all map-only.
3. ``repartitionByRange`` on the z-key (one range shuffle) +
   ``sortWithinPartitions`` + parquet write: file count = partition
   count, each file a contiguous z-range.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_zordered", "zorder_key"]

_BITS = 6  # 64 quantile buckets per column


def _bucket_expr(col: str, edges: list[float]) -> F.Column:
    """Quantile bucket id (0..len(edges)) as a codegen'd CASE chain."""
    expr = F.lit(len(edges))
    for i in reversed(range(len(edges))):
        expr = F.when(F.col(col) <= F.lit(edges[i]), F.lit(i)).otherwise(expr)
    return expr.cast("long")


def zorder_key(df: DataFrame, cols: list[str], bits: int = _BITS) -> F.Column:
    """Morton interleave of per-column quantile-bucket ids. Quantile
    (not equi-width) buckets keep the key balanced under skew."""
    n_buckets = (1 << bits) - 1
    probs = [i / (n_buckets + 1) for i in range(1, n_buckets + 1)]
    # ONE quantile scan for every column (the list form) — per-column
    # calls would re-scan the input len(cols) times
    all_edges = df.approxQuantile(cols, probs, 0.01)
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        b = _bucket_expr(c, all_edges[ci])
        for bit in range(bits):
            # bit `bit` of this column lands at interleaved position
            # bit*len(cols) + ci
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(b, bit).bitwiseAND(F.lit(1).cast("long")),
                    bit * len(cols) + ci,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = _BITS,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``cols``."""
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of ``cols`` — the statistics a skipping reader
    uses; exposed for tests and layout audits."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy("__f").agg(*aggs)
