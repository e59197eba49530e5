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
- ``documents.text`` is relabeled through a per-replica affine letter
  permutation so WITHIN-replica string structure (shingles, lines, edit
  distances, lengths) is identical to sf0.1 while CROSS-replica overlap
  is ~0 in both shingle and edit-distance space: the corpus keeps a
  constant duplicate RATE as it grows (the realistic scale-up), instead
  of every doc gaining N-1 near twins (which would quadratically flood
  every LSH bucket / edit-distance block and measure a data artifact,
  not the plan);
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

# non-identity affine maps c -> a*c + b (mod 26), gcd(a, 26) = 1, in a
# fixed enumeration: replica i > 0 uses _AFFINE_MAPS[i - 1]; replica 0 is
# the identity (the untouched source copy)
_AFFINE_MAPS = [
    (a, b)
    for a in range(1, 26, 2)
    if a != 13
    for b in range(26)
    if (a, b) != (1, 0)
]

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
        # Relabel letters through a replica-specific AFFINE permutation
        # c -> a*c + b (mod 26), gcd(a, 26) = 1 — 312 distinct maps.
        # Injective symbol relabeling preserves WITHIN-replica structure
        # EXACTLY for every string-space op (edit distance, word/shingle
        # equality, line equality, repeated substrings, lengths), so the
        # corpus keeps a constant dup/near-dup RATE as it grows; and any
        # two distinct affine maps agree on at most 2 of the 26 letters
        # ((a1-a2)c = b2-b1 mod 26 has <= gcd(a1-a2, 26) = 2 solutions),
        # so CROSS-replica copies of the same doc differ at essentially
        # every letter position — far apart in BOTH shingle and
        # edit-distance space.  The earlier word-tag schemes measured
        # data artifacts instead: a 2-letter suffix left cross-replica
        # pairs within edit distance 2 (q193 x282.9 at 100x = quadratic
        # OUTPUT, not plan), and a prepended tag made all docs within a
        # replica share a window prefix (denser matches, q193 x8.2).
        a, b = _AFFINE_MAPS[i - 1]
        lo = "".join(chr(ord("a") + (a * c + b) % 26) for c in range(26))
        src = "abcdefghijklmnopqrstuvwxyz" + "abcdefghijklmnopqrstuvwxyz".upper()
        df = df.withColumn("text", F.translate("text", src, lo + lo.upper()))
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
    # uniqueness guards (and the embeddings schema probe itself) apply
    # only to the tables actually generated: a documents-only 300x sweep
    # must not be blocked by the embedding rotation cycle (2*(dim-1)=126)
    # nor fail on a src directory that has no embeddings.parquet at all
    emb_dim = 0
    if not only or "embeddings" in only:
        emb_dim = int(
            spark.read.parquet(f"{args.src}/embeddings.parquet")
            .selectExpr("size(embedding) AS d")
            .first()["d"]
        )
        assert args.replicas <= 2 * (emb_dim - 1), (
            f"embedding derivations repeat past 2*(dim-1)={2 * (emb_dim - 1)} "
            "replicas — cross-replica exact twins would poison the sweep"
        )
    if not only or "documents" in only:
        assert args.replicas <= 1 + len(_AFFINE_MAPS), (
            f"text derivations repeat past {1 + len(_AFFINE_MAPS)} replicas — "
            "cross-replica exact twins would poison the sweep"
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
