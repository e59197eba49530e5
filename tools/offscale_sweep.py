"""Upward off-scale sweep: run the heaviest suite queries serially at two
scale factors and report the per-query scale ratio.

A plan that is linear in the data should show time(sf1)/time(sf0.1) near
the data ratio (10x) or below (fixed overheads amortize); a superlinear
blowup (quadratic candidate sets, per-round growth in iterative CC,
driver-side materialization) shows up as a ratio far above it. Results
go to BENCH_OFFSCALE.json and a markdown table on stdout.

Usage: python tools/offscale_sweep.py [--base /root/testdata/sf0.1]
       [--big /tmp/sf1] [--ratio 10] [--top 20] [--queries q60,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_dataset_spark.session import get_spark
import __spark_entry__ as entrymod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sf1")
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--queries", default="")
    ap.add_argument(
        "--reps",
        type=int,
        default=2,
        help="runs per (query, scale) leg; the MIN is recorded. One rep "
        "conflates first-run codegen/JIT with scaling: the base leg runs "
        "cold and the big leg warm, so sub-second-base queries report "
        "inflated ratios (q79 x13.3 single-rep vs x1.0 warm)",
    )
    ap.add_argument(
        "--out",
        default="BENCH_OFFSCALE.json",
        help="output file name (repo-root-relative) — use a different name "
        "for sweeps at a non-default ratio so the committed 10x table "
        "is never replaced by a partial run",
    )
    args = ap.parse_args()

    queries = entrymod.queries()
    if args.queries:
        names = [n for n in args.queries.split(",") if n]
        unknown = [n for n in names if n not in queries]
        # fail BEFORE measuring anything: a typo'd name used to KeyError
        # mid-loop and discard every row already measured (merge happens
        # only at the end)
        assert not unknown, f"unknown queries: {unknown}"
    else:
        detail_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_DETAIL.json",
        )
        with open(detail_path) as fh:
            prev = json.load(fh)["queries"]
        names = [
            n
            for n, _ in sorted(prev.items(), key=lambda kv: -kv[1])
            if n in queries
        ][: args.top]
    spark = get_spark("offscale_sweep")
    # warmup: parquet IO + shuffle + Arrow worker pool
    from pyspark.sql import functions as F

    spark.read.parquet(f"{args.base}/lineitem.parquet").count()
    w = spark.range(0, 1 << 14, 1, 32).withColumn("g", F.col("id") % 32)
    w.groupBy("g").applyInPandas(lambda p: p, "id long, g long").write.format(
        "noop"
    ).mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = queries[name]
        row: dict[str, float] = {}
        for key, sf_dir in (("base", args.base), ("big", args.big)):
            best = float("inf")
            for _ in range(max(1, args.reps)):
                # internal .cache()/localCheckpoint survives across reps
                # (CacheManager matches by logical plan), so a second rep
                # would measure a cache HIT, not the query — clear first
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row[key] = round(best, 2)
        row["ratio"] = round(row["big"] / max(row["base"], 1e-9), 1)
        results[name] = row
        flag = "  <-- SUPERLINEAR?" if row["ratio"] > 2.5 * args.ratio else ""
        print(
            f"{name:32s} {row['base']:8.2f}s -> {row['big']:8.2f}s"
            f"  x{row['ratio']:.1f}{flag}",
            flush=True,
        )
    spark.stop()

    # MERGE into the existing table (a --queries run must not discard the
    # committed full-suite rows): same-name rows are replaced, the rest
    # kept, max_ratio recomputed over the union
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        args.out,
    )
    merged: dict[str, dict[str, float]] = {}
    try:
        with open(path) as fh:
            prev_out = json.load(fh)
        if (
            prev_out.get("base") == args.base
            and prev_out.get("big") == args.big
            and prev_out.get("data_ratio") == args.ratio
        ):
            # only reuse rows measured at the SAME data ratio — merging a
            # --queries rerun at a different --ratio would report old rows
            # under the new ratio
            merged = dict(prev_out.get("queries", {}))
    except (OSError, ValueError):
        pass
    merged.update(results)
    # queries whose cost is quadratic BY CONTRACT (each is the declared
    # exact baseline for a bucketed/banded scale path, and is whitelisted
    # in tests/test_plans.py): their ratios legitimately exceed the data
    # ratio and are excluded from max_subquadratic_ratio
    declared_quadratic = {"q35_embedding_neardup", "q61_join_where"}
    out = {
        "data_ratio": args.ratio,
        "base": args.base,
        "big": args.big,
        "queries": merged,
        "declared_quadratic": sorted(declared_quadratic & set(merged)),
        "max_ratio": max(
            (r["ratio"] for r in merged.values() if isinstance(r, dict)),
            default=0.0,
        ),
        "max_subquadratic_ratio": max(
            (
                r["ratio"]
                for n, r in merged.items()
                if isinstance(r, dict) and n not in declared_quadratic
            ),
            default=0.0,
        ),
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
