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

__all__ = ["merge_upsert", "apply_deletes"]


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
