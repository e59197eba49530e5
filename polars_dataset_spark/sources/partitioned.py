"""Hive-style partitioned parquet: directory-level partition pruning.

At 100 TB the cheapest rows are the ones never read: writing with
``partitionBy(k)`` lays files out as ``k=v/`` directories, and a filter
on ``k`` prunes at PLANNING time — the scan lists only the matching
directories (visible as ``PartitionFilters`` on the scan node); files
elsewhere are never opened, not even their footers. Complementary to
bucketing (:mod:`polars_dataset_spark.sources.bucketed`): partition on
the low-cardinality predicate column (date, category, language), bucket
on the high-cardinality join key.

Partition-count discipline at scale: every distinct tuple of partition
values becomes a directory — keep cardinality ≤ ~10⁴–10⁵ (a date or
category column: yes; user_id: never — that is what bucketing/salting
is for). Small-file pressure: repartition by the partition columns
before writing so each directory receives a few large files instead of
one file per upstream task (200 tasks × 1000 partitions = 200k files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_partitioned", "read_partitioned"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
    coalesce_output: bool = True,
) -> None:
    """Write ``df`` as hive-partitioned parquet under ``path``.

    ``coalesce_output`` (default): repartition by the partition columns
    first, so each partition directory gets one file per shuffle
    partition holding its key instead of one file per upstream task —
    the difference between 10³ and 10⁶ files at cluster scale."""
    pc = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    out = df.repartition(*pc) if coalesce_output else df
    out.write.mode(mode).partitionBy(*pc).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back; partition columns are recovered
    from the directory names and filters on them prune at planning time."""
    return spark.read.parquet(path)
