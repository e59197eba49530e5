"""Benchmark runner: every suite query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query materializes fully through the ``noop`` sink (distributed
execution, no driver collect). Queries are submitted from a small thread
pool — concurrent Spark jobs share the executor pool, so the scheduler
overlaps one query's scheduling/IO gaps with another's compute (exactly
how a cluster serves a query mix); ``value`` is the honest WALL-CLOCK of
the whole suite, with per-query times (measured per submission) in
``queries`` and their serial sum in ``sum_query_sec``. Set
``SPARK_GRAFT_BENCH_WORKERS=1`` for a strictly serial run.

Prints ONE compact JSON line (the driver records only a bounded tail of
stdout — r01/r02 recorded ``parsed: null`` because the full 137-query map
overflowed it):
{"metric": ..., "value": wall_sec, "unit": "sec", "queries": {20 slowest},
 "sum_query_sec": ..., "n_queries": ..., "sf": ...}
and writes the FULL per-query timing map to ``BENCH_DETAIL.json`` beside
this file.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polars_dataset_spark.session import get_spark
import __spark_entry__ as entrymod


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    workers = int(os.environ.get("SPARK_GRAFT_BENCH_WORKERS", "4"))
    spark = get_spark("bench")
    queries = entrymod.queries()
    # one warm-up action so JVM/codegen startup isn't billed to the first query
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}

    def run_one(item):
        name, fn = item
        # fair pool per submission: with spark.scheduler.mode=FAIR
        # (session.py), pools share executor slots round-robin, so a
        # query made of many small jobs (iterative CC, two-pass prefix
        # sum) isn't starved behind a concurrent query's big stages.
        # Queries hash onto the fixed pool set declared in
        # conf/fairscheduler.xml (declared pools ⇒ no builder warnings);
        # the property is thread-local, set per submission.
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"pool{sum(name.encode()) % 8}"
        )
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Longest-job-first submission: the handful of heavy queries
    # (iterative CC, LSH pipelines) start immediately and overlap the
    # stream of sub-second queries, instead of piling up together at the
    # tail where they contend only with each other — classic makespan
    # scheduling, and it also cuts run-to-run wall variance.
    # SELF-TUNING: order by the previous run's per-query times
    # (BENCH_DETAIL.json) so the list never goes stale as the suite
    # grows; the static list is the cold-start fallback.
    heavy = [
        "q63_connected_components",
        "q60_clean_corpus",
        "q64_dedup_components",
        "q58_ivf_topk",
        "q105_approx_distinct",
        "q100_corr_matrix",
        "q41_fourier",
        "q38_simhash_dedup",
        "q76_regrid_uniform",
        "q77_fourier_spline",
        "q97_tfidf_topk",
        "q106_horizontal",
        "q59_group_by_dynamic",
        "q37_minhash_pairs",
        "q36_neardup_lsh",
        "q65_salted_join",
        "q40_regrid",
    ]
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    prev: dict[str, float] = {}
    try:
        with open(detail_path) as fh:
            prev = json.load(fh).get("queries", {})
    except (OSError, ValueError):
        pass
    rank = {n: i for i, n in enumerate(heavy)}
    ordered = sorted(
        queries.items(),
        key=lambda it: (
            -prev.get(it[0], 0.0),              # measured time, descending
            rank.get(it[0], len(rank)),          # cold-start fallback
        ),
    )

    t_start = time.perf_counter()
    if workers <= 1:
        for item in ordered:
            run_one(item)
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(run_one, ordered))
    wall = round(time.perf_counter() - t_start, 3)
    summary = {
        "metric": "suite_total_wall_sec",
        "value": wall,
        "unit": "sec",
        # 20 slowest only: keeps the line inside the driver's stdout-tail
        # budget so it parses; the full map goes to BENCH_DETAIL.json
        "queries": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:20]
        ),
        "sum_query_sec": round(sum(timings.values()), 3),
        "n_queries": len(timings),
        "workers": workers,
        "sf": sf,
    }
    detail = dict(summary)
    detail["queries"] = dict(sorted(timings.items()))
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
        "w",
    ) as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
