"""Bucketed tables: pay the shuffle once at write time, never at join time.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders on
orderkey) is shuffling both sides. Bucketing is Spark's answer: write
each table hash-partitioned AND sorted by the join key into a fixed
number of buckets (``DataFrameWriter.bucketBy(...).sortBy(...)``); a
join between two tables bucketed by the same key into the same bucket
count is planned as a sort-merge join with NO Exchange on either side —
the scan itself satisfies the distribution requirement. The same
applies to groupBy on the bucket key.

Bucketed writes go through the session catalog (``saveAsTable`` — plain
``.parquet(path)`` cannot record bucket metadata), so the table name,
not a path, is the handle. ``spark.sql.sources.bucketing.enabled`` is
on by default; ``spark.sql.sources.v2.bucketing.enabled`` extends this
to v2 sources.

Bucket count choice at scale: target bucket files of 100-500 MB post
compression — e.g. 100 TB / 256 MB ≈ 400k is too many buckets (file-
per-bucket-per-writer explosion); instead bucket the JOIN KEY SPACE
(e.g. 4096) and let each bucket hold multiple row groups. Bucket count
must match across tables to elide the shuffle (Spark can coalesce
mismatched counts only when one is a multiple of the other, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed (and bucket-sorted)
    by ``bucket_cols``. Joins/aggregations on those columns against any
    same-bucketed table then plan with zero Exchange operators."""
    bc = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sc = (
        bc
        if sort_cols is None
        else ([sort_cols] if isinstance(sort_cols, str) else list(sort_cols))
    )
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bc)
        .sortBy(*sc)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata live (the
    catalog carries it; a raw ``spark.read.parquet`` of the same files
    would NOT know the bucketing and would re-shuffle)."""
    return spark.table(table)
