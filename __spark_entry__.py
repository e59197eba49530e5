"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`polars_dataset_spark.suite`; every entry is
an operator from SURVEY.md §2 expressed through the package's public API.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from polars_dataset_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The star join through the Dataset API: broadcast dimension chain over
    the fact table, revenue per region."""
    return suite.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query —
    including the LSH family (seeded hyperplanes / seeded minhash lanes
    replayed as literals), regrid (on-knot identity), FFT (O(n²) SQL
    DFT), simhash (portable md5-bit variant) and IVF (fixed-centroid
    variant). Intentionally rows-only — only q76/q77, the off-knot
    spline interpolation variants, whose numerics are pinned by
    pytest/hypothesis instead."""
    return dict(suite.ORACLES)
