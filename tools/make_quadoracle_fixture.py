"""Keyed-subset fixture for the QUADRATIC-ORACLE family at the sf10
decade (r11, VERDICT r10 #6).

The remaining sf10 exclusions are queries whose DuckDB ORACLE is
all-pairs by construction (exact-Jaccard pair CTEs, recursive-CTE
closures, C(n,2) cosine) — the Spark side is banded/linear, but the
verification replay is quadratic in the document/embedding count, so
500 k sf10 docs are infeasible for the CHECKER. Fix: value-check them
on a deterministic md5-keyed 1/8 subset of the sf10 corpus — oracle
cost lands at the same order as the known-green sf0.1 sweep (50 k
docs), while the DATA is genuinely sf10-decade content (the replica
letter-permutations and doc-id space the sf0.1 run never saw). Every
``queries()``/``oracle_sql()`` pair is a functional identity on ANY
fixture, so both engines run on the same subset and the comparison is
exact.

- ``documents``: rows whose ``md5(cast(doc_id as string))`` starts
  with hex 0-1 (a deterministic 1/8 keyed sample, ~62 k docs).
- ``embeddings``: same rule on ``vec_id`` (~25 k vectors).
- everything else: symlinked from /tmp/sf10s (these queries read only
  documents/embeddings; the links keep the table registry complete).

Usage: python tools/make_quadoracle_fixture.py [--src /tmp/sf10]
       [--sampled /tmp/sf10s] [--dst /tmp/sf10q]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_dataset_spark.session import get_spark

_HEX_KEEP = ("0", "1")  # 1/8 of keys

KEYED = {"documents": "doc_id", "embeddings": "vec_id"}
LINK = [
    "nation", "region", "part", "supplier", "customer", "orders",
    "lineitem", "events",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf10")
    ap.add_argument("--sampled", default="/tmp/sf10s")
    ap.add_argument("--dst", default="/tmp/sf10q")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    spark = get_spark("make-quadoracle-fixture")

    for table, key in KEYED.items():
        df = spark.read.parquet(f"{args.src}/{table}.parquet")
        out = df.filter(
            F.substring(F.md5(F.col(key).cast("string")), 1, 1).isin(*_HEX_KEEP)
        )
        out.repartition(4).write.mode("overwrite").parquet(
            f"{args.dst}/{table}.parquet"
        )
        n = spark.read.parquet(f"{args.dst}/{table}.parquet").count()
        print(f"{table}: keyed 1/8 subset on {key} -> {n:,d} rows")

    for table in LINK:
        dst = f"{args.dst}/{table}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{args.sampled}/{table}.parquet", dst)
        print(f"{table}: linked from {args.sampled}")
    spark.stop()


if __name__ == "__main__":
    main()
