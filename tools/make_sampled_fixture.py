"""Keyed-subset copy of a big fixture for the SAMPLED oracle sweep
(r10, VERDICT r9 #2).

The r9 sf10 sweep left 46 exclusions; 36 of them were adjudicated
"DuckDB-side full-table window/quantile replay at 60 M rows is
verification cost, not an engine property". The sampled-oracle fix:
every ``queries()``/``oracle_sql()`` pair is a functional identity that
holds on ANY fixture, so value-check those 36 on a copy of sf10 that
keeps WHOLE partitions but only a deterministic md5-keyed subset of
partition keys — per-window depth stays at the top decade (lineitem
retains one complete ~10 M-row (returnflag, linestatus) group, the
exact window the q09-class runs over), while total verification cost
drops ~5x on both engines.

Filters (all deterministic, no RNG):
- ``lineitem``: the ONE (l_returnflag, l_linestatus) combo whose
  ``md5(flag || '|' || status)`` is lexicographically smallest — a full
  sf10-depth window partition, nothing hand-picked.
- ``orders`` / ``events`` / ``customer``: rows whose key's
  ``md5(cast(key as string))`` starts with hex 0-3 (a 1/4 keyed
  sample) — per-customer / per-uid groups stay COMPLETE, so windowed /
  sessionized values are unchanged for every retained key.
- everything else: copied as-is (small).

Usage: python tools/make_sampled_fixture.py [--src /tmp/sf10] [--dst /tmp/sf10s]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_dataset_spark.session import get_spark

# key-subset rule: md5 first hex char 0-3 => exactly 1/4 of keys
_HEX_KEEP = ("0", "1", "2", "3")

KEYED = {
    "orders": "o_custkey",
    "events": "user_id",
    "customer": "c_custkey",
}

COPY = ["nation", "region", "part", "supplier", "documents", "embeddings"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf10")
    ap.add_argument("--dst", default="/tmp/sf10s")
    args = ap.parse_args()
    spark = get_spark("make-sampled-fixture")

    li = spark.read.parquet(f"{args.src}/lineitem.parquet")
    combo = F.md5(F.concat_ws("|", "l_returnflag", "l_linestatus"))
    keep = (
        li.select("l_returnflag", "l_linestatus").distinct()
        .withColumn("__h", combo)
        .orderBy("__h")
        .first()
    )
    print(f"lineitem: keeping combo {keep['l_returnflag']}/{keep['l_linestatus']}")
    (
        li.filter(
            (F.col("l_returnflag") == keep["l_returnflag"])
            & (F.col("l_linestatus") == keep["l_linestatus"])
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{args.dst}/lineitem.parquet")
    )

    for table, key in KEYED.items():
        df = spark.read.parquet(f"{args.src}/{table}.parquet")
        out = df.filter(
            F.substring(F.md5(F.col(key).cast("string")), 1, 1).isin(*_HEX_KEEP)
        )
        out.repartition(4).write.mode("overwrite").parquet(
            f"{args.dst}/{table}.parquet"
        )
        print(f"{table}: keyed 1/4 subset on {key}")

    for table in COPY:
        spark.read.parquet(f"{args.src}/{table}.parquet").repartition(
            2
        ).write.mode("overwrite").parquet(f"{args.dst}/{table}.parquet")
        print(f"{table}: copied")

    for t in ["lineitem", *KEYED, *COPY]:
        n = spark.read.parquet(f"{args.dst}/{t}.parquet").count()
        print(f"{t:12s} {n:>12,d} rows")
    spark.stop()


if __name__ == "__main__":
    main()
