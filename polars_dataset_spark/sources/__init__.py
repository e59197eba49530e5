from polars_dataset_spark.sources.datafile import Datafile, create_dataset
from polars_dataset_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["Datafile", "create_dataset", "TABLES", "load_table", "register_views"]
