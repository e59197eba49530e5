"""Key-skew profiler (functions/profiling.py)."""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import key_skew_profile


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [(i, "hot" if i % 10 < 8 else f"k{i}", None if i % 2 else "x") for i in range(100)]
    return spark.createDataFrame(rows, "id long, key string, maybe string")


def test_profile_values(skewed):
    prof = {r["col_name"]: r for r in key_skew_profile(skewed, ["key", "id"]).collect()}
    k = prof["key"]
    assert k["n_rows"] == 100 and k["top1_key"] == "hot" and k["top1_cnt"] == 80
    assert k["top1_share"] == 0.8
    # 21 distinct keys (hot + 20 cold): skew = 80 * 21 / 100
    assert k["n_distinct"] == 21 and k["skew_factor"] == round(80 * 21 / 100, 4)
    i = prof["id"]
    assert i["n_distinct"] == 100 and i["top1_cnt"] == 1 and i["skew_factor"] == 1.0


def test_nulls_count_as_a_key(skewed):
    prof = {r["col_name"]: r for r in key_skew_profile(skewed, ["maybe"]).collect()}
    m = prof["maybe"]
    # 50 nulls vs 50 "x": tie at 50, deterministic tie-break = max string
    assert m["top1_cnt"] == 50 and m["n_distinct"] == 2
    assert m["top1_key"] == "x"  # "x" > "<null>"


def test_validates_columns(skewed):
    with pytest.raises(ValueError):
        key_skew_profile(skewed, [])
    with pytest.raises(ValueError):
        key_skew_profile(skewed, ["nope"])


def test_single_shuffle_plan(skewed):
    from tests.test_plans import count_exchanges

    prof = key_skew_profile(skewed, ["key", "id", "maybe"])
    # one exchange for the (col,value) counts + one for the tiny per-col
    # rollup — profiling k columns must NOT cost k scans/shuffles
    assert count_exchanges(prof) <= 2
