from polars_dataset_spark.sources.datafile import Datafile, create_dataset

__all__ = ["Datafile", "create_dataset"]
