"""Duplicate-subtree audit: for every suite query, count physical-plan
nodes that indicate REPEATED upstream work — parquet scans of the same
table, Python eval stages (FlatMapGroupsInPandas / MapInPandas /
ArrowEvalPython / BatchEvalPython), exchanges — in the INITIAL plan tree.

A query whose plan scans the same parquet table K times (without a
ReusedExchange covering it) recomputes that subtree K times at runtime;
at 100 TB that is K full passes over the input. Output: JSON map sorted
by (python_nodes, scans) descending so the worst recomputation offenders
surface first.

Usage: python tools/dup_subtree_audit.py [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_NODE_RE = re.compile(
    r"^\s*[+:]?-+\s*(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9_]*)"
)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dup_audit.json"
    from polars_dataset_spark import suite
    from polars_dataset_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dup-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    rows = {}
    for name, fn in suite.QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            rows[name] = {"error": str(exc)[:200]}
            continue
        tree = plan.split("\n\n", 1)[0]  # numbered tree only, not details
        counts = {
            "scan_parquet": tree.count("Scan parquet"),
            "flatmap_pandas": tree.count("FlatMapGroupsInPandas"),
            "map_in_pandas": tree.count("MapInPandas"),
            "arrow_eval": tree.count("ArrowEvalPython"),
            "batch_eval": tree.count("BatchEvalPython"),
            "exchange": tree.count("Exchange"),
            "reused_exchange": tree.count("ReusedExchange"),
            "scan_existing_rdd": tree.count("Scan ExistingRDD"),
            "sort_merge_join": tree.count("SortMergeJoin"),
            "cartesian": tree.count("CartesianProduct"),
            "in_mem_relation": tree.count("InMemoryTableScan"),
        }
        counts["python_stages"] = (
            counts["flatmap_pandas"]
            + counts["map_in_pandas"]
            + counts["arrow_eval"]
            + counts["batch_eval"]
        )
        rows[name] = counts
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=1, sort_keys=True)
    worst = sorted(
        (r for r in rows.items() if "error" not in r[1]),
        key=lambda kv: -(kv[1]["python_stages"] * 3 + kv[1]["scan_parquet"]),
    )[:30]
    for n, c in worst:
        print(
            f"{n:38s} scans={c['scan_parquet']:3d} py={c['python_stages']:3d} "
            f"exch={c['exchange']:3d} reused={c['reused_exchange']:2d} "
            f"smj={c['sort_merge_join']:2d}"
        )
    print(f"full map -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
