"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python tools/dump_plans.py --tag r12 --suffix before q231_warc_roundtrip ...
    python tools/dump_plans.py --tag r12 --suffix before --all   # every query

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) without executing
the query (explain only), so this is cheap. The judge checks plan claims in
OPTIMIZATION notes against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    tag, suffix = "r12", "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2 :]
    run_all = "--all" in args
    if run_all:
        args.remove("--all")

    from polars_dataset_spark import suite
    from polars_dataset_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = list(suite.QUERIES) if run_all else args
    unknown = [n for n in names if n not in suite.QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    for name in names:
        df = suite.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
