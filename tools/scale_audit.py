"""Emit a per-query physical-plan inventory (SCALE_AUDIT.json): shuffle
exchange count, join strategies, TakeOrdered usage, Python-UDF presence,
and the red flags the plan tests enforce (single-partition exchanges,
nested-loop joins, cartesian products).

`tests/test_plans.py` ENFORCES the invariants; this tool RECORDS the
whole suite's plan shapes in one reviewable artifact, so a round-over-
round diff shows exactly which queries gained/lost a shuffle or changed
join strategy — the "would this plan survive 100x" reflection, written
down.

Usage: python tools/scale_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_dataset_spark import suite
from polars_dataset_spark.plans import (
    count_exchanges,
    count_joins,
    explain_str,
    has_take_ordered,
    is_python_path,
    single_partition_consumers,
)
from polars_dataset_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scale_audit")
    rows: dict[str, dict] = {}
    for name, fn in sorted(suite.QUERIES.items()):
        df = fn(spark, sf_dir)
        text = explain_str(df)
        joins = count_joins(df)
        # single-partition detection via the EXECUTED plan consumer walk
        # (the explain_str substring form could never match — the
        # round-7 dead-guard finding); consumers recorded so bounded
        # global-agg shapes are distinguishable from sort/window reds
        sp = single_partition_consumers(df)
        rows[name] = {
            "exchanges": count_exchanges(df),
            "joins": {k: v for k, v in joins.items() if v},
            "take_ordered": has_take_ordered(df),
            "python_udf": is_python_path(
                df._jdf.queryExecution().executedPlan().toString()
            ),
            "single_partition": bool(sp),
            "single_partition_consumers": sp,
            "cartesian": "CartesianProduct" in text,
        }
        print(f"{name:36s} x={rows[name]['exchanges']:2d} "
              f"joins={rows[name]['joins']} "
              f"{'TO ' if rows[name]['take_ordered'] else ''}"
              f"{'PY ' if rows[name]['python_udf'] else ''}", flush=True)
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(rows),
        "total_exchanges": sum(r["exchanges"] for r in rows.values()),
        "python_udf_queries": sorted(n for n, r in rows.items() if r["python_udf"]),
        "single_partition_queries": sorted(
            n for n, r in rows.items() if r["single_partition"]
        ),
        "unbounded_single_partition_queries": sorted(
            n
            for n, r in rows.items()
            if any(
                c not in ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
                for c in r["single_partition_consumers"]
            )
        ),
        "queries": rows,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_AUDIT.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"\n{len(rows)} queries -> {path}")
    print(f"total exchanges: {out['total_exchanges']}")
    print(f"python-path queries: {len(out['python_udf_queries'])}")
    print(f"single-partition queries: {out['single_partition_queries']}")
    spark.stop()


if __name__ == "__main__":
    main()
