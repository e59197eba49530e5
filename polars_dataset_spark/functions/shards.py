"""Deterministic training-shard assignment and writing.

The last step of a training-data pipeline is a GLOBAL SHUFFLE: examples
must reach the trainer in a reproducible pseudo-random order, split into
size-balanced shards that stream independently. Doing this with a real
``ORDER BY rand()`` is a full sort with a non-reproducible key; the
portable form is order-by-hash:

- ``shard = portable_hash(salt, id) mod n_shards`` — the same md5-based
  hash as :mod:`polars_dataset_spark.functions.sampling`, so the split is
  reproducible across engines, runs, and cluster sizes (adding machines
  never moves an example);
- within a shard, examples order by the SAME hash — a deterministic
  pseudo-random order (documents that were adjacent in the source are
  scattered), which is exactly what curriculum-free training wants;
- ``write_training_shards`` realizes it as ONE hash-partition shuffle
  (``repartition(n_shards, shard)``) + ``sortWithinPartitions`` + a
  hive-partitioned write — each task writes its own shard directory, no
  global sort, no single-partition stage, shard count independent of
  input partitioning.

Everything here restates in ANSI SQL (the q66/q67 md5 pattern), so the
assignment and order are driver-oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["assign_training_shards", "write_training_shards"]


def _order_hash(id_col: str, salt: str) -> F.Column:
    # the package-wide 60-bit portable hash (collision-free enough for
    # ordering, never negative) — ONE definition so shard and sample
    # reproducibility can't silently diverge
    from polars_dataset_spark.functions.sampling import portable_hash_long

    return portable_hash_long(id_col, salt)


def assign_training_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "",
    shard_col: str = "shard",
    order_col: str = "shard_pos",
) -> DataFrame:
    """Add ``shard_col`` (0..n_shards-1, md5-uniform so shard sizes are
    balanced) and ``order_col`` (the 60-bit order hash; ascending =
    this shard's deterministic training order). Map-only — no shuffle
    until the caller writes or windows."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _order_hash(id_col, salt)
    return df.withColumns(
        {shard_col: F.pmod(h, F.lit(n_shards)).cast("int"), order_col: h}
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` hive-partitioned directories
    (``shard=K/``), rows within each shard stored in the deterministic
    order-hash order. One hash-partition shuffle total; each task sorts
    and writes exactly one shard, so output file count = shard count
    whatever the input partitioning."""
    assigned = assign_training_shards(df, id_col, n_shards, salt)
    (
        # sort key leads with `shard`: the hive writer requires each task's
        # rows ordered by the partition columns and inserts its own
        # (UNSTABLE, shard-only) sort when they aren't — which would
        # scramble the shard_pos order the whole op exists to provide
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_pos")
        .drop("shard_pos")
        .write.mode("overwrite")
        .format(fmt)
        .partitionBy("shard")
        .save(path)
    )
