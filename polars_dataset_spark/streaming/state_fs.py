"""Filesystem-abstracted write-then-swap for streaming state directories.

``stream_merge_upsert`` / ``stream_heavy_hitters`` persist their state as
a parquet directory replaced per micro-batch with a two-rename protocol
(target -> __old, __staging -> target) plus crash repair. Round-4 review
flagged that driving those renames through ``os.rename`` pins the
protocol to POSIX paths — useless on the HDFS/object-store substrate a
100-TB deployment actually runs on. This module routes every exists /
rename / delete through the **Hadoop FileSystem API** on the JVM
(``Path.getFileSystem(hadoopConf)``), so the SAME protocol runs against
``file:``, ``hdfs:``, and any Hadoop-compatible connector (``s3a:``,
``gs:``, ``abfs:``) without touching the calling code.

Atomicity contract, stated honestly:

- ``file:`` / ``hdfs:``: directory rename is ATOMIC — the crash window is
  exactly the gap between the two renames, and the repair step (restore
  ``__old`` when the target is missing) closes it on the checkpointed
  re-run.
- S3A-style object stores: "rename" is client-side copy-then-delete —
  O(data) and non-atomic, so a crash can leave a PARTIAL target that the
  repair step cannot distinguish from a complete one. The protocol still
  *converges* (every re-run rewrites the full state), but for production
  object-store deployments prefer a table format (Delta/Iceberg MERGE in
  the same ``foreachBatch`` body) whose commit is a metadata swap; this
  module keeps plain-parquet state correct everywhere rename is atomic
  and dependency-free everywhere else.
"""

from __future__ import annotations

__all__ = ["hfs_exists", "hfs_rename", "hfs_delete", "repair_state", "swap_state"]


def _fs_path(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def hfs_exists(spark, path: str) -> bool:
    fs, jpath, _ = _fs_path(spark, path)
    return bool(fs.exists(jpath))


def hfs_rename(spark, src: str, dst: str) -> None:
    fs, jsrc, jvm = _fs_path(spark, src)
    ok = fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst))
    if not ok:
        raise IOError(f"filesystem rename failed: {src} -> {dst}")


def hfs_delete(spark, path: str) -> None:
    fs, jpath, _ = _fs_path(spark, path)
    # recursive; returns False when the path didn't exist — fine either way
    fs.delete(jpath, True)


def repair_state(spark, target_path: str) -> None:
    """Run BEFORE touching state: a previous run that died between its two
    renames leaves the data in ``__old`` with no target — restore it, or
    the caller would silently restart from the current batch alone. A
    leftover ``__old`` WITH a live target is just unfinished cleanup;
    remove it so the upcoming rename cannot collide. Stale staging writes
    are overwritten by mode("overwrite")."""
    old = f"{target_path}__old"
    if hfs_exists(spark, old) and not hfs_exists(spark, target_path):
        hfs_rename(spark, old, target_path)
    hfs_delete(spark, old)


def swap_state(spark, target_path: str) -> None:
    """Swap ``__staging`` (already written, distributed) into place:
    two directory renames driver-side, no data through the driver. The
    crash window between them is repaired by :func:`repair_state` on the
    checkpointed re-run."""
    old = f"{target_path}__old"
    if hfs_exists(spark, target_path):
        hfs_rename(spark, target_path, old)
    hfs_rename(spark, f"{target_path}__staging", target_path)
    hfs_delete(spark, old)
