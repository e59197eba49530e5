from polars_dataset_spark.plans.inspect import (
    explain_str,
    pushed_filters,
    read_schema_columns,
    count_joins,
    count_exchanges,
    expensive_snippet_counts,
    has_take_ordered,
    has_unbounded_single_partition,
    is_python_path,
    plan_report,
    scale_report,
    single_partition_consumers,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_joins",
    "count_exchanges",
    "expensive_snippet_counts",
    "has_take_ordered",
    "has_unbounded_single_partition",
    "is_python_path",
    "plan_report",
    "scale_report",
    "single_partition_consumers",
]
