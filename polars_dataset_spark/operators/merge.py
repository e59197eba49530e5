"""Key-based merge (upsert) and delta application for batch tables.

Lakehouse formats (Delta/Iceberg/Hudi) implement MERGE INTO natively;
on plain parquet the same semantics are one anti-join + one union —
updates win on key collision, inserts append. The anti-join is the only
shuffle and it is on the merge key; with a small update set AQE plans
it as a broadcast, making the merge map-only over the base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "apply_deletes", "snapshot_diff"]


def merge_upsert(base: DataFrame, updates: DataFrame, on: list[str] | str) -> DataFrame:
    """MERGE semantics on DataFrames: rows of ``base`` whose key appears
    in ``updates`` are replaced by the update row; new keys are
    appended. Both sides must share a schema (checked by the
    ``unionByName``). One anti-join (broadcast for small update sets)
    plus a union — no window, no full-table sort."""
    keys = [on] if isinstance(on, str) else list(on)
    kept = base.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


def apply_deletes(base: DataFrame, deletes: DataFrame, on: list[str] | str) -> DataFrame:
    """Anti-join delete application: drop every base row whose key
    appears in ``deletes`` (e.g. a GDPR tombstone list)."""
    keys = [on] if isinstance(on, str) else list(on)
    return base.join(deletes.select(*keys).distinct(), on=keys, how="left_anti")


def snapshot_diff(
    old: DataFrame, new: DataFrame, on: list[str] | str
) -> DataFrame:
    """Change-data-capture between two snapshots of a keyed table:
    returns every differing row tagged ``change_type`` ∈
    {'insert', 'delete', 'update'}. One full-outer join on the key; the
    value comparison is a null-safe struct equality, all codegen."""
    keys = [on] if isinstance(on, str) else list(on)
    old_types = {f.name: f.dataType for f in old.schema.fields}
    new_types = {f.name: f.dataType for f in new.schema.fields}
    if old_types != new_types:
        diff = {
            c
            for c in set(old_types) | set(new_types)
            if old_types.get(c) != new_types.get(c)
        }
        raise ValueError(f"snapshot_diff: schemas differ on columns {sorted(diff)}")
    vals = [c for c in new.columns if c not in keys]
    if not vals:
        # key-only table: no value columns to compare, so the diff is
        # pure membership — insert/delete, never update (F.struct() with
        # zero fields is an analysis error, hence the explicit path)
        o = old.select(*keys).withColumn("__old", F.lit(1))
        n = new.select(*keys).withColumn("__new", F.lit(1))
        joined = o.join(n, on=keys, how="full_outer")
        tag = F.when(F.col("__old").isNull(), F.lit("insert")).when(
            F.col("__new").isNull(), F.lit("delete")
        )
        return (
            joined.withColumn("change_type", tag)
            .filter(F.col("change_type").isNotNull())
            .select(*keys, "change_type")
        )
    o = old.select(*keys, F.struct(*vals).alias("__old"))
    n = new.select(*keys, F.struct(*vals).alias("__new"))
    joined = o.join(n, on=keys, how="full_outer")
    tag = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("update"))
    )
    changed = joined.withColumn("change_type", tag).filter(F.col("change_type").isNotNull())
    side = F.coalesce(F.col("__new"), F.col("__old"))
    return changed.select(
        *keys,
        *[side.getField(c).alias(c) for c in vals],
        "change_type",
    )
