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


def test_column_profile(spark):
    from polars_dataset_spark.functions import column_profile

    rows = [(1, "a", 10.5), (2, "b", None), (3, None, 2.5), (4, "a", 99.0)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    prof = {r["col_name"]: r for r in column_profile(df, ["id", "s", "v"]).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_distinct"] == 4
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "4"
    assert prof["s"]["n_null"] == 1 and prof["s"]["null_frac"] == 0.25
    assert prof["s"]["n_distinct"] == 2  # NULL excluded
    # native numeric ordering, not lexicographic: 2.5 < 10.5, though '10.5' < '2.5'
    assert prof["v"]["min_value"] == "2.5" and prof["v"]["max_value"] == "99.0"
    with pytest.raises(ValueError):
        column_profile(df, [])
    with pytest.raises(ValueError):
        column_profile(df, ["nope"])


def test_k_anonymity_audit(spark):
    from polars_dataset_spark.functions import k_anonymity_audit

    rows = [("a", "x")] * 5 + [("a", "y")] * 2 + [("b", "x")] * 1
    df = spark.createDataFrame(rows, "g string, h string")
    out = {(r["g"], r["h"]): r for r in k_anonymity_audit(df, ["g", "h"], k=3).collect()}
    assert not out[("a", "x")]["at_risk"] and out[("a", "x")]["class_size"] == 5
    assert out[("a", "y")]["at_risk"] and out[("b", "x")]["at_risk"]
    with pytest.raises(ValueError):
        k_anonymity_audit(df, [], k=3)
    with pytest.raises(ValueError):
        k_anonymity_audit(df, ["g"], k=0)


def test_edit_distance_join_sound_blocking(spark):
    from polars_dataset_spark.functions import edit_distance_join

    left = spark.createDataFrame(
        [(1, "kitten"), (2, "abcdef"), (3, "xy")], "doc_id long, s string"
    )
    right = spark.createDataFrame(
        [(10, "sitting"), (11, "abXdef"), (12, "xyz"), (13, "zzzzzz")],
        "doc_id long, s string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(left, right, col="s", max_dist=3).collect()
    }
    # kitten->sitting is the textbook distance 3 (crosses a length boundary)
    assert got[(1, 10)] == 3
    assert got[(2, 11)] == 1
    assert got[(3, 12)] == 1
    assert (1, 13) not in got and (2, 13) not in got  # all-different 6-char strings: dist 6
    # brute-force parity
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    expected = {
        (l["doc_id"], r["doc_id"]): lev(l["s"], r["s"])
        for l, r in itertools.product(left.collect(), right.collect())
        if lev(l["s"], r["s"]) <= 3
    }
    assert got == expected


def test_edit_distance_join_segment_blocking_hypothesis(spark):
    """Brute-force parity on a randomized corpus spanning the blocking
    regimes: variable lengths, fixed lengths (where length blocking
    alone degenerates), short strings (< k+1, the fallback bucket),
    and k=0/1/2."""
    import itertools
    import random

    from polars_dataset_spark.functions import edit_distance_join

    rng = random.Random(42)
    alphabet = "abc"
    words = []
    for i in range(60):
        n = rng.choice([0, 1, 2, 3, 6, 8, 8, 8, 8, 12])
        words.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    df = spark.createDataFrame(words, "doc_id long, s string")

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    for k in (0, 1, 2):
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in edit_distance_join(df, df, col="s", max_dist=k).collect()
        }
        expected = {
            (a[0], b[0]): lev(a[1], b[1])
            for a, b in itertools.product(words, words)
            if lev(a[1], b[1]) <= k
        }
        assert got == expected, (k, len(got), len(expected))
