from polars_dataset_spark.plans.inspect import (
    explain_str,
    pushed_filters,
    read_schema_columns,
    count_joins,
    count_exchanges,
    expensive_snippet_counts,
    has_take_ordered,
    plan_report,
    scale_report,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_joins",
    "count_exchanges",
    "expensive_snippet_counts",
    "has_take_ordered",
    "plan_report",
    "scale_report",
]
