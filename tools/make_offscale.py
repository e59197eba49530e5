"""Generate an UPWARD off-scale copy of the driver testdata (default: sf1
= 10x sf0.1) for the superlinearity sweep (tools/offscale_sweep.py).

The driver only ships sf{0.001,0.01,0.1}; the downward sweep (sf0.001)
catches degenerate-input bugs, but superlinear blowups (CC round count,
LSH band fan-out, prefix-sum partition count) only show UP-scale. This
writes a derived sf1 under /tmp (never under /root/testdata, which is
read-only) by unioning REPLICAS key-offset copies of each scaling table:

- every key column is offset by ``replica * KEY_STRIDE`` consistently
  across tables, so intra-replica join relationships (customer->orders->
  lineitem, part/supplier->lineitem) are preserved and cross-replica keys
  never collide -> join fan-outs scale linearly, exactly like a bigger
  TPC-H SF;
- ``nation``/``region`` stay fixed (TPC-H scales facts, not these dims);
- ``documents.text`` gets a per-replica word-level suffix so WITHIN-
  replica dup/near-dup structure is identical to sf0.1 while CROSS-
  replica shingle overlap is ~0: the corpus keeps a constant duplicate
  RATE as it grows (the realistic scale-up), instead of every doc gaining
  9 exact twins (which would quadratically flood every LSH bucket and
  measure a data artifact, not the plan);
- ``embeddings.embedding`` is rotated by ``replica`` positions per copy:
  within-replica neighbor structure is preserved exactly, cross-replica
  cosine is that of a randomly permuted vector (~0 in expectation);
- ``events`` keeps timestamps and offsets user/event ids: 10x the users,
  same per-user session shape.

Usage: python tools/make_offscale.py [--replicas 10] [--src /root/testdata/sf0.1]
       [--dst /tmp/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from polars_dataset_spark.session import get_spark

KEY_STRIDE = 10_000_000  # > any key at sf0.1 (max ~600k), so offsets never collide

# table -> (key columns to offset, output file count)
OFFSET_COLS = {
    "customer": (["c_custkey"], 4),
    "orders": (["o_orderkey", "o_custkey"], 16),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 32),
    "part": (["p_partkey"], 4),
    "supplier": (["s_suppkey"], 1),
    "events": (["event_id", "user_id"], 16),
    "documents": (["doc_id"], 8),
    "embeddings": (["vec_id"], 4),
}
FIXED = ["nation", "region"]


def _replica(df: DataFrame, table: str, i: int, emb_dim: int = 64) -> DataFrame:
    for c in OFFSET_COLS[table][0]:
        df = df.withColumn(c, F.col(c) + F.lit(i * KEY_STRIDE))
    if table == "documents" and i > 0:
        # suffix every whitespace-delimited word with a replica-specific
        # TWO-letter tag (unique up to 676 replicas — one letter repeated
        # past 26 and reintroduced cross-replica exact twins): all
        # k-shingles differ from every other replica's, so near-dup
        # candidates stay intra-replica (constant dup RATE)
        suf = chr(ord("a") + (i - 1) % 26) + chr(ord("a") + ((i - 1) // 26) % 26)
        df = df.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", r"$1" + suf)
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings" and i > 0:
        # rotate by the ACTUAL dimension's cycle; past one full cycle of
        # rotations, NEGATE the vector as well (negation preserves
        # intra-replica cosine structure exactly, and cos(v, -v) = -1 keeps
        # replica i vs i-(dim-1) pairs out of any positive-threshold
        # near-dup set) — unique up to 2*(dim-1) replicas, asserted in main
        n = F.size("embedding")
        cyc = emb_dim - 1
        rot = (i - 1) % cyc + 1  # 1..dim-1, never a full-cycle no-op
        sign = F.lit(-1.0 if ((i - 1) // cyc) % 2 else 1.0)
        df = df.withColumn(
            "embedding",
            F.transform(
                F.concat(
                    F.slice("embedding", F.lit(rot + 1), n - F.lit(rot)),
                    F.slice("embedding", 1, rot),
                ),
                lambda x: x * sign,
            ),
        )
    return df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument(
        "--tables",
        default="",
        help="comma list: generate only these scaling tables (fixed dims "
        "always copied) — e.g. documents,embeddings for a targeted deep "
        "sweep without paying for a 100x lineitem",
    )
    args = ap.parse_args()
    assert not args.dst.startswith("/root/testdata"), "testdata is read-only"
    only = {t for t in args.tables.split(",") if t}
    unknown = only - set(OFFSET_COLS)
    assert not unknown, f"unknown tables: {sorted(unknown)}"

    spark = get_spark("make_offscale")
    os.makedirs(args.dst, exist_ok=True)
    for table in FIXED:
        src = spark.read.parquet(f"{args.src}/{table}.parquet")
        src.coalesce(1).write.mode("overwrite").parquet(f"{args.dst}/{table}.parquet")
        print(f"{table}: copied fixed dim")
    emb_dim = int(
        spark.read.parquet(f"{args.src}/embeddings.parquet")
        .selectExpr("size(embedding) AS d")
        .first()["d"]
    )
    assert args.replicas <= 2 * (emb_dim - 1), (
        f"embedding derivations repeat past 2*(dim-1)={2 * (emb_dim - 1)} "
        "replicas — cross-replica exact twins would poison the sweep"
    )
    for table, (_, nfiles) in OFFSET_COLS.items():
        if only and table not in only:
            continue
        src = spark.read.parquet(f"{args.src}/{table}.parquet")
        out = None
        for i in range(args.replicas):
            rep = _replica(src, table, i, emb_dim)
            out = rep if out is None else out.unionByName(rep)
        out.repartition(nfiles).write.mode("overwrite").parquet(
            f"{args.dst}/{table}.parquet"
        )
        print(f"{table}: x{args.replicas} -> {args.dst}/{table}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
