"""Physical-plan inspection utilities.

The scale contract of this engine ("would this plan survive 100 TB?") is
enforced as *testable plan properties*, not prose: filters must reach the
parquet scan, projections must prune the read schema, dimension joins must
broadcast, top-k must plan TakeOrderedAndProject. These helpers extract
those facts from the executed plan so ``tests/test_plans.py`` can assert
them and any regression (a shim that breaks pushdown, an operator that
sneaks in a sort-merge join) fails CI rather than surfacing as a 100×
slowdown on a cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_joins",
    "count_exchanges",
    "has_take_ordered",
    "plan_report",
]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text ``df.explain(mode)`` would print."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def _executed(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the data source scan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each scan (column pruning check)."""
    text = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def count_joins(df: DataFrame) -> dict[str, int]:
    text = _executed(df)
    return {
        "broadcast_hash": text.count("BroadcastHashJoin"),
        "sort_merge": text.count("SortMergeJoin"),
        "shuffled_hash": text.count("ShuffledHashJoin"),
        "broadcast_nested_loop": text.count("BroadcastNestedLoopJoin"),
    }


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded)."""
    text = _executed(df)
    return len(re.findall(r"(?<!Broadcast)Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", text))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in _executed(df)


def plan_report(df: DataFrame) -> dict:
    """One-call summary used in notebooks/debugging."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schema_columns(df),
        "joins": count_joins(df),
        "shuffle_exchanges": count_exchanges(df),
        "take_ordered": has_take_ordered(df),
    }
