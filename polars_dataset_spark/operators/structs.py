"""Struct flatten / rebuild round-trip.

Reference parity: ``_unnest_structs`` flattens every struct column to
prefixed scalars ``"{name}.{field}"`` recording a schema map, and
``_rebuild_structs`` reassembles them (``/root/reference/polars_dataset.py:
240-253`` and ``:255-263``). Both are pure projections here — Catalyst
collapses them with adjacent selects, so the round-trip costs nothing at
plan level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["unnest_structs", "rebuild_structs", "sanitize_columns", "restore_columns"]

# applyInPandas resolves its input with df[col], which parses "." as struct
# access — flattened "{struct}.{field}" names must be made dot-free around
# any grouped-map operator and restored afterwards.
_DOT = "__dot__"


def sanitize_columns(df: DataFrame) -> tuple[DataFrame, dict[str, str]]:
    """Replace '.' in column names with a safe token; returns (df, mapping
    safe→original)."""
    mapping = {c.replace(".", _DOT): c for c in df.columns if "." in c}
    if not mapping:
        return df, {}
    return df.toDF(*[c.replace(".", _DOT) for c in df.columns]), mapping


def restore_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Inverse of :func:`sanitize_columns`."""
    if not mapping:
        return df
    return df.toDF(*[mapping.get(c, c) for c in df.columns])


def unnest_structs(df: DataFrame) -> tuple[DataFrame, dict[str, list[str]]]:
    """Flatten all struct columns to ``"{name}.{field}"`` scalar columns.

    Returns the flattened frame and a ``{struct_name: [field, ...]}`` map
    for :func:`rebuild_structs`.
    """
    schema_map: dict[str, list[str]] = {}
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StructType):
            subfields = [f.name for f in field.dataType.fields]
            schema_map[field.name] = subfields
            for sub in subfields:
                cols.append(F.col(f"`{field.name}`.`{sub}`").alias(f"{field.name}.{sub}"))
        else:
            cols.append(F.col(f"`{field.name}`"))
    return df.select(*cols), schema_map


def rebuild_structs(df: DataFrame, schema_map: dict[str, list[str]]) -> DataFrame:
    """Re-nest previously flattened ``"{name}.{field}"`` columns, restoring
    original field names and column positions."""
    out_cols = []
    seen: set[str] = set()
    for c in df.columns:
        if "." in c:
            name = c.split(".", 1)[0]
            if name in schema_map:
                if name not in seen:
                    seen.add(name)
                    out_cols.append(
                        F.struct(
                            *[F.col(f"`{name}.{f}`").alias(f) for f in schema_map[name]]
                        ).alias(name)
                    )
                continue
        out_cols.append(F.col(f"`{c}`"))
    return df.select(*out_cols)
