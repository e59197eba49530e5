from polars_dataset_spark.sources.bucketed import read_bucketed, write_bucketed
from polars_dataset_spark.sources.compact import CompactionStats, compact_files
from polars_dataset_spark.sources.datafile import Datafile, create_dataset
from polars_dataset_spark.sources.partitioned import read_partitioned, write_partitioned
from polars_dataset_spark.sources.tables import TABLES, load_table, register_views
from polars_dataset_spark.sources.jsonl import (
    read_jsonl,
    read_jsonl_split,
    split_corrupt,
    write_jsonl,
)
from polars_dataset_spark.sources.warc import (
    build_warc_record,
    fetch_warc_records,
    mark_revisits,
    parse_warc,
    warc_record_at,
    warc_records,
    write_warc,
    write_wat,
    write_wet,
)

__all__ = [
    "parse_warc",
    "warc_records",
    "warc_record_at",
    "fetch_warc_records",
    "build_warc_record",
    "mark_revisits",
    "write_warc",
    "write_wat",
    "write_wet",
    "read_jsonl",
    "read_jsonl_split",
    "split_corrupt",
    "write_jsonl",
    "Datafile",
    "create_dataset",
    "TABLES",
    "load_table",
    "register_views",
    "read_bucketed",
    "write_bucketed",
    "read_partitioned",
    "write_partitioned",
    "compact_files",
    "CompactionStats",
]
