"""Recrawl change-rate estimation (functions/recrawl): the
Cho–Garcia-Molina estimator against hand-computed histories, clamps,
single-fetch gate, and input-order independence."""

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from polars_dataset_spark.functions.recrawl import estimate_change_rate


def _hist(url, digests, start=datetime(2026, 1, 1), step_days=1.0):
    return [
        (url, start + timedelta(days=i * step_days), d)
        for i, d in enumerate(digests)
    ]


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url string, fetch_ts timestamp, digest string")
    return {r.url: r for r in estimate_change_rate(df).collect()}


def test_static_page_gets_max_interval(spark):
    got = _run(spark, _hist("u", ["a"] * 10))
    r = got["u"]
    assert r.n_fetches == 10 and r.n_changes == 0
    assert r.avg_interval_days == 1.0
    assert r.change_per_interval == 0.0
    assert r.next_fetch_days == 365.0 and r.bucket == "quarterly"


def test_always_changing_page_clamps_to_daily(spark):
    got = _run(spark, _hist("u", [f"v{i}" for i in range(10)]))
    r = got["u"]
    assert r.n_changes == 9
    # r_hat = -ln(0.5/9.5) = ln(19)
    assert abs(r.change_per_interval - round(math.log(19.0), 6)) < 1e-9
    assert r.next_fetch_days == 1.0 and r.bucket == "daily"


def test_partial_change_rate_matches_formula(spark):
    # digest changes every 3rd fetch: 10 fetches, changes at i=3,6,9
    got = _run(spark, _hist("u", [f"v{i // 3}" for i in range(10)]))
    r = got["u"]
    assert r.n_changes == 3
    rhat = -math.log((9 - 3 + 0.5) / 9.5)
    assert abs(r.change_per_interval - round(rhat, 6)) < 1e-9
    assert abs(r.next_fetch_days - round(1.0 / rhat, 6)) < 1e-9
    assert r.bucket == "weekly"


def test_single_fetch_is_zero_evidence(spark):
    got = _run(spark, _hist("u", ["a"]))
    r = got["u"]
    assert r.n_fetches == 1 and r.n_changes == 0
    assert r.avg_interval_days is None and r.change_per_interval is None
    assert r.next_fetch_days == 365.0 and r.bucket == "quarterly"


def test_input_order_does_not_matter(spark):
    rows = _hist("u", ["a", "a", "b", "b", "c"])
    fwd = _run(spark, rows)["u"]
    rev = _run(spark, list(reversed(rows)))["u"]
    assert fwd == rev
    assert fwd.n_changes == 2


def test_interval_scaling(spark):
    # same change pattern, weekly fetch spacing -> next scales by 7
    daily = _run(spark, _hist("u", ["a", "a", "b", "b"]))["u"]
    weekly = _run(spark, _hist("u", ["a", "a", "b", "b"], step_days=7.0))["u"]
    assert weekly.avg_interval_days == 7.0
    assert weekly.change_per_interval == daily.change_per_interval
    # both sides round to 6 decimals independently -> tolerance 1e-5
    assert abs(weekly.next_fetch_days - 7.0 * daily.next_fetch_days) < 1e-5
