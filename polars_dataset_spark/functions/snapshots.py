"""Crawl snapshot diffing — what changed between two crawls.

Every recrawl cycle ends with the same question: which URLs are new,
which disappeared, which changed content, which are byte-identical?
The answer drives the whole incremental pipeline — only ``added`` and
``changed`` pages re-enter extraction/dedup/indexing, ``removed`` URLs
tombstone out of the index, and the change ratios feed the per-URL
recrawl scheduler (functions/recrawl) as fresh evidence.

:func:`crawl_diff` is deliberately one plan shape: a single FULL OUTER
hash join on the url key (both snapshots shuffle ONCE on the key they
are naturally keyed by) and a codegen'd status projection — no window,
no second pass. ``summarize=True`` folds the verdict into per-status
counts with one more (tiny, 4-row) aggregate.

Digests are whatever the archive already carries (sources/warc records
payload sha1s; CDX ``digest`` fields) — bytes never need re-reading to
diff two crawls.

Reference envelope: `/root/reference/polars_dataset.py` has no crawl
surface; driver-mandated pipeline extension family (SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["crawl_diff"]


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    digest_col: str = "digest",
    summarize: bool = False,
) -> DataFrame:
    """Diff two crawl snapshots ``(key, digest)`` → one row per key in
    EITHER snapshot with ``old_digest`` / ``new_digest`` / ``status``
    in {``added``, ``removed``, ``changed``, ``unchanged``}. Keys are
    assumed unique per snapshot (dedup upstream — an archive index is
    keyed); duplicate keys would cross-multiply in the join like any
    keyed diff. ``summarize=True`` returns the 4-row
    ``(status, n)`` rollup instead. One full-outer hash shuffle on the
    key; status is pure codegen."""
    from polars_dataset_spark.session import ensure_parallelism

    o = ensure_parallelism(old).select(
        F.col(key_col).alias("url"), F.col(digest_col).alias("old_digest")
    )
    n = new.select(
        F.col(key_col).alias("url"), F.col(digest_col).alias("new_digest")
    )
    j = o.join(n, on="url", how="full")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select("url", "old_digest", "new_digest", status.alias("status"))
    if summarize:
        return out.groupBy("status").agg(F.count("*").cast("bigint").alias("n"))
    return out
