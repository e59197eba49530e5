"""Behavioral bot detection (functions/behavior.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import flag_bots, user_behavior_features

T0 = dt.datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    # user 1: metronome — one 'ping' exactly every 10 s (a cron bot)
    for i in range(100):
        rows.append((1, T0 + dt.timedelta(seconds=10 * i), "ping"))
    # user 2: human-ish — irregular gaps, mixed types
    g = 0.0
    for i in range(50):
        g += (1 + (i * 37 % 113)) * 60  # irregular but deterministic, minutes-scale
        rows.append((2, T0 + dt.timedelta(seconds=g), ["view", "click", "buy"][i % 3]))
    # user 3: single event
    rows.append((3, T0, "view"))
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_features(events):
    f = {r["user_id"]: r for r in user_behavior_features(events).collect()}
    bot = f[1]
    assert bot["n_events"] == 100 and bot["n_types"] == 1
    assert bot["gap_cv"] == 0.0  # perfectly regular
    assert bot["type_entropy_bits"] == 0.0
    assert bot["mean_gap_s"] == 10.0
    assert abs(bot["events_per_day"] - 100 * 86400 / 990) < 0.01
    human = f[2]
    assert human["n_types"] == 3 and human["gap_cv"] > 0.3
    assert human["type_entropy_bits"] > 1.5
    single = f[3]
    assert single["gap_cv"] is None and single["mean_gap_s"] is None
    assert single["events_per_day"] is None
    assert single["type_entropy_bits"] == 0.0


def test_flags(events):
    out = {r["user_id"]: r for r in flag_bots(events).collect()}
    assert out[1]["too_regular"] and out[1]["too_narrow"] and out[1]["is_bot"]
    assert not out[2]["is_bot"]
    # single-event user: regularity unknowable -> not flagged on it
    assert not out[3]["too_regular"]
    assert out[3]["too_narrow"]  # one type = zero entropy


def test_partitioning_invariance(events):
    a = sorted(map(tuple, user_behavior_features(events).collect()))
    b = sorted(map(tuple, user_behavior_features(events.repartition(13)).collect()))
    assert a == b
