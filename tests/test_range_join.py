"""Bucketized range join: equivalence to the naive theta join, bucket-width
edge cases, extra equi keys, and the plan claim (hash join, not
BroadcastNestedLoop)."""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.operators.range_join import range_join


@pytest.fixture(scope="module")
def numeric_case(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "pid long, x double"
    )
    intervals = spark.createDataFrame(
        [(0, 5.0, 12.0), (1, 11.5, 11.6), (2, 90.0, 99.0), (3, 200.0, 210.0)],
        "iid long, s double, e double",
    )
    return points, intervals


def _expected(points, intervals):
    pts = [(r["pid"], r["x"]) for r in points.collect()]
    ivs = [(r["iid"], r["s"], r["e"]) for r in intervals.collect()]
    return sorted(
        (pid, iid) for pid, x in pts for iid, s, e in ivs if s <= x <= e
    )


def test_range_join_matches_naive(numeric_case):
    points, intervals = numeric_case
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "s", "e").collect()
    )
    assert got == _expected(points, intervals)


@pytest.mark.parametrize("width", [0.5, 1.0, 7.0, 1000.0])
def test_range_join_any_bucket_width(numeric_case, width):
    # width below/above interval lengths changes replication, never results
    points, intervals = numeric_case
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "x", "s", "e", bucket_width=width
        ).collect()
    )
    assert got == _expected(points, intervals)


def test_range_join_with_extra_equi_key(spark):
    points = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0)], "pid long, k string, x double"
    )
    intervals = spark.createDataFrame(
        [(10, "a", 0.0, 10.0)], "iid long, k string, s double, e double"
    )
    got = [
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "x", "s", "e", extra_on=["k"]
        ).collect()
    ]
    assert got == [(1, 10)]  # k='b' point excluded despite containment


def test_range_join_empty_intervals(spark, numeric_case):
    points, _ = numeric_case
    empty = spark.createDataFrame([], "iid long, s double, e double")
    assert range_join(points, empty, "x", "s", "e").count() == 0


def test_range_join_plans_hash_not_bnl(spark, sf_dir):
    from polars_dataset_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    win = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 2 MINUTES")).alias("e"),
    )
    naive = ev.select("ts").join(
        win, (F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e"))
    )
    naive.collect()
    assert "BroadcastNestedLoop" in naive._jdf.queryExecution().executedPlan().toString()
    bucketized = range_join(ev.select("ts", "value"), win, "ts", "s", "e")
    bucketized.collect()
    plan = bucketized._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
