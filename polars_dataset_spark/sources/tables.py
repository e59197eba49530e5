"""Loaders for the benchmark star-schema tables.

``events.parquet`` is written with nanosecond timestamps, which Spark's
parquet reader rejects outright (``PARQUET_TYPE_ILLEGAL``). The documented
escape hatch is ``spark.sql.legacy.parquet.nanosAsLong`` — the column
arrives as raw nanos (long) and is converted to a proper timestamp via
``timestamp_micros`` here. All other tables read natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

__all__ = ["TABLES", "load_table", "register_views"]

# session → {(sf_dir, name): DataFrame}. DataFrames are immutable logical
# plans, so reuse across queries is safe and skips repeated footer reads /
# file listings (~0.1 s per load, and most queries load several tables).
# Keyed WEAKLY by the session object: a stopped/collected session drops its
# whole entry, so a recycled id() can never alias stale plans.
import weakref

_cache: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one benchmark table; normalizes the events nano-timestamp.
    Plans are memoized per (session, sf_dir, table)."""
    try:
        per_session = _cache.setdefault(spark, {})
    except TypeError:  # session type not weak-referenceable: skip caching
        per_session = {}
    key = (sf_dir, name)
    hit = per_session.get(key)
    if hit is not None:
        return hit
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        # Nano-timestamped files surface `ts` as a raw long (via the
        # nanosAsLong escape hatch); micro/milli files read natively as a
        # timestamp. Convert only the former. `ts div 1000`, not
        # `ts / 1000`: `/` produces a double and epoch-nano magnitudes
        # (~1.7e18) exceed 2^53, so a non-µs-aligned nano value would
        # truncate to an off-by-one microsecond.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # micro/milli files arrive as TIMESTAMP_NTZ; normalize to
            # TIMESTAMP (session-tz, UTC here) — watermarks/event-time ops
            # require it, and it keeps batch and stream schemas identical
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    per_session[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view; returns the map."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
