"""allocate_budget (functions/budget): exact-sum invariant, known
hand-computed apportionments, tie-break determinism, and gates."""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions.budget import allocate_budget


def _run(spark, rows, budget):
    df = spark.createDataFrame(rows, "key string, weight double")
    return {r.key: r.quota for r in allocate_budget(df, budget).collect()}


def test_hand_computed_hamilton(spark):
    # weights 5,3,2 over budget 10: exact 5,3,2 -> no remainders
    assert _run(spark, [("a", 5.0), ("b", 3.0), ("c", 2.0)], 10) == {
        "a": 5, "b": 3, "c": 2,
    }
    # weights 1,1,1 over 10: exact 3.33 each, floors 3, one leftover
    # -> largest remainders tie, key-ascending gets it
    assert _run(spark, [("a", 1.0), ("b", 1.0), ("c", 1.0)], 10) == {
        "a": 4, "b": 3, "c": 3,
    }


def test_sum_is_exactly_budget(spark):
    rows = [(f"k{i:03d}", float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "key string, weight double")
    out = allocate_budget(df, 997)
    assert out.agg(F.sum("quota")).first()[0] == 997


def test_proportionality(spark):
    got = _run(spark, [("big", 90.0), ("small", 10.0)], 100)
    assert got == {"big": 90, "small": 10}


def test_nonpositive_weights_dropped(spark):
    got = _run(spark, [("a", 2.0), ("z", 0.0), ("n", -1.0)], 7)
    assert got == {"a": 7}


def test_negative_budget_raises(spark):
    with pytest.raises(ValueError):
        _run(spark, [("a", 1.0)], -1)
