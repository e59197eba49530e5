"""Small-file compaction — the table-maintenance op every long-lived
parquet dataset needs.

Streaming sinks, per-trigger appends, and over-parallel writes leave
directories with thousands of KB-sized files; at scan time each costs a
task plus a footer read, and a 100-TB table with 10⁸ tiny files is
unqueryable long before it is large. ``compact_files`` rewrites a
directory to ``ceil(rows / target_rows)`` (or size-derived) evenly-sized
files with ONE round-robin repartition — no sort, no driver data — and
swaps the result in with the same crash-safe two-rename protocol the
streaming state uses (:mod:`polars_dataset_spark.streaming.state_fs`,
Hadoop FileSystem API — works on ``file:``/``hdfs:``/object stores).

This is the dependency-free core of what table formats expose as
``OPTIMIZE``; for clustering-preserving compaction compose with
:func:`polars_dataset_spark.sources.zorder.write_zordered` instead.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

__all__ = ["compact_files", "CompactionStats"]


class CompactionStats:
    """What the rewrite did: ``n_rows``, ``files_before``, ``files_after``."""

    def __init__(self, n_rows: int, files_before: int, files_after: int):
        self.n_rows = int(n_rows)
        self.files_before = int(files_before)
        self.files_after = int(files_after)

    def __repr__(self) -> str:  # pragma: no cover - debug nicety
        return (
            f"CompactionStats(n_rows={self.n_rows}, "
            f"files_before={self.files_before}, files_after={self.files_after})"
        )


def _data_files(spark: SparkSession, path: str) -> list:
    """Data files under ``path`` via the Hadoop FS API (scheme-agnostic).
    Non-recursive: compaction targets a flat file directory (compact a
    hive-partitioned table per partition directory)."""
    from polars_dataset_spark.streaming.state_fs import _fs_path

    fs, jpath, _ = _fs_path(spark, path)
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            out.append((name, int(st.getLen())))
    return out

def compact_files(
    spark: SparkSession,
    path: str,
    target_rows: int | None = None,
    target_bytes: int | None = None,
    fmt: str = "parquet",
) -> CompactionStats:
    """Rewrite the ``fmt`` directory at ``path`` into
    ``ceil(n_rows / target_rows)`` files (or, with ``target_bytes``,
    ``ceil(current_bytes / target_bytes)`` — sizes taken from the file
    listing, one metadata call, no data read). Exactly one of the two
    targets must be given. Row-count preservation is re-checked after
    the rewrite; the swap is crash-repairable (staging + two renames).
    """
    if (target_rows is None) == (target_bytes is None):
        raise ValueError("give exactly one of target_rows / target_bytes")
    from polars_dataset_spark.streaming.state_fs import repair_state, swap_state

    repair_state(spark, path)  # adopt a previously crashed compaction first
    files = _data_files(spark, path)
    files_before = len(files)
    df = spark.read.format(fmt).load(path)
    n_rows = df.count()
    if target_rows is not None:
        if target_rows < 1:
            raise ValueError(f"target_rows must be >= 1, got {target_rows}")
        files_after = math.ceil(n_rows / target_rows)
    else:
        if target_bytes < 1:
            raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
        total = sum(sz for _, sz in files)
        files_after = math.ceil(total / target_bytes)
    # never plan more files than rows (the writer skips empty partitions,
    # so the plan would overstate the physical listing — possible on the
    # bytes path when per-file metadata dwarfs the data)
    files_after = max(1, min(files_after, max(n_rows, 1)))
    (
        df.repartition(files_after)
        .write.mode("overwrite")
        .format(fmt)
        .save(f"{path}__staging")
    )
    n_staged = spark.read.format(fmt).load(f"{path}__staging").count()
    if n_staged != n_rows:
        raise RuntimeError(
            f"compaction row-count mismatch: {n_rows} read, {n_staged} staged"
        )
    swap_state(spark, path)
    return CompactionStats(n_rows, files_before, files_after)
