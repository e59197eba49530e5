"""JSONL source/sink (sources/jsonl, r11): explicit-schema reads,
PERMISSIVE corrupt handling, the one-pass good/quarantine split (and
why it exists — Spark forbids corrupt-only queries on the native
reader), compression, and round-trip fidelity."""

import json

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.sources import (
    read_jsonl,
    read_jsonl_split,
    split_corrupt,
    write_jsonl,
)

SCHEMA = "doc_id long, text string"


@pytest.fixture()
def mixed_dir(tmp_path):
    p = tmp_path / "data"
    p.mkdir()
    with open(p / "a.json", "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": "alpha"}) + "\n")
        fh.write("totally broken\n")
        fh.write(json.dumps({"doc_id": 2, "text": "beta"}) + "\n")
        fh.write('{"doc_id": 3, "text": unterminated\n')
    return str(p)


def test_read_with_schema_and_corrupt_column(spark, mixed_dir):
    df = read_jsonl(spark, mixed_dir, schema=SCHEMA)
    assert "_corrupt_record" in df.columns
    good, bad = split_corrupt(df)
    assert {r.doc_id for r in good.collect()} == {1, 2}
    # quarantine keeps all columns (the corrupt-only query restriction)
    assert {r._corrupt_record for r in bad.collect()} == {
        "totally broken",
        '{"doc_id": 3, "text": unterminated',
    }


def test_read_jsonl_split_counts_freely(spark, mixed_dir):
    good, bad = read_jsonl_split(spark, mixed_dir, SCHEMA)
    # the whole point: corrupt-only aggregates work (native reader raises)
    assert bad.count() == 2
    assert good.count() == 2
    assert "_corrupt_record" not in good.columns
    native = read_jsonl(spark, mixed_dir, schema=SCHEMA)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    with pytest.raises((AnalysisException, Py4JJavaError)):
        native.filter(F.col("_corrupt_record").isNotNull()).count()


def test_round_trip_with_compression(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, f"text {i} é") for i in range(100)], SCHEMA
    )
    out = str(tmp_path / "out")
    write_jsonl(src, out, compression="gzip", partitions=2)
    import glob

    assert glob.glob(f"{out}/*.json.gz")
    good, bad = read_jsonl_split(spark, out, SCHEMA)
    assert bad.count() == 0
    assert sorted((r.doc_id, r.text) for r in good.collect()) == sorted(
        (r.doc_id, r.text) for r in src.collect()
    )


def test_null_fields_are_not_corrupt(spark, tmp_path):
    p = tmp_path / "n"
    p.mkdir()
    with open(p / "a.json", "w") as fh:
        fh.write('{"doc_id": null, "text": null}\n')
    good, bad = read_jsonl_split(spark, str(p), SCHEMA)
    assert bad.count() == 0 and good.count() == 1


def test_split_plan_is_scan_filter_only(spark, mixed_dir):
    good, _bad = read_jsonl_split(spark, mixed_dir, SCHEMA)
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
