"""Guard against the q25 bug class: a DuckDB oracle emitting a HUGEINT
(windowed/plain ``sum`` over integers) or DECIMAL output column.  Pandas
materialises those as float64, so the driver's stringified value hash
sees ``"1.0"`` vs Spark's ``"1"`` — hash-fail with rows/schema matching
(VERDICT r02 "What's wrong" #1).  Every oracle must CAST such columns.

Planning-only (duckdb relation .types), so this is fast and needs no
Spark session.
"""

import duckdb
import pytest

from polars_dataset_spark.sources.tables import TABLES
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

BANNED = ("HUGEINT", "DECIMAL", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_no_hugeint_or_decimal_outputs(con):
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            ts = str(typ)
            if any(b in ts for b in BANNED):
                offenders.append((name, col, ts))
    assert not offenders, (
        "oracles emitting HUGEINT/DECIMAL columns (cast to BIGINT/DOUBLE "
        f"in the SQL): {offenders}"
    )


def test_no_nested_output_columns(con):
    """Guard against the q166 bug class: the driver's canonicalizer
    pandas-sorts every output column and crashes on unhashable cells, so
    an ``array``/``struct``/``map`` output column is driver-red even when
    the values are right (VERDICT r05 "What's wrong" #1).  Every oracle
    output must be scalar — posexplode/unnest nested results instead.

    Oracle-side (planning-only) is sufficient: the driver's schema gate
    fails unless the Spark output carries the same column shapes."""
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            ts = str(typ)
            if "[]" in ts or "STRUCT" in ts or "MAP" in ts or "LIST" in ts:
                offenders.append((name, col, ts))
    assert not offenders, (
        "oracles emitting nested (list/struct/map) output columns — the "
        f"driver canonicalizer cannot hash these: {offenders}"
    )
