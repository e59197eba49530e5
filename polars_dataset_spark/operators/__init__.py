from polars_dataset_spark.operators.structs import unnest_structs, rebuild_structs
from polars_dataset_spark.operators.regrid import regrid, interpolate_frame
from polars_dataset_spark.operators.fourier import fourier_transform, lomb_scargle
from polars_dataset_spark.operators.autophase import autophase, fit_phase, zero_quadrature
from polars_dataset_spark.operators.asof import join_asof
from polars_dataset_spark.operators.skew import salted_join
from polars_dataset_spark.operators.range_join import range_join
from polars_dataset_spark.operators.bloom import bitset_prefilter_join
from polars_dataset_spark.operators.merge import merge_upsert, apply_deletes, snapshot_diff

__all__ = [
    "salted_join",
    "range_join",
    "bitset_prefilter_join",
    "merge_upsert",
    "apply_deletes",
    "snapshot_diff",
    "unnest_structs",
    "rebuild_structs",
    "regrid",
    "interpolate_frame",
    "fourier_transform",
    "lomb_scargle",
    "autophase",
    "fit_phase",
    "zero_quadrature",
    "join_asof",
]
