import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.sources import load_table
from polars_dataset_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    session_agg,
    sessionize_batch,
    windowed_agg,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_windowed_agg_batch(events):
    out = windowed_agg(events, window="1 hour")
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == events.count()


def test_windowed_agg_stream_matches_batch(spark, sf_dir, events):
    batch = windowed_agg(events, window="1 hour")
    st = read_events_stream(spark, f"{sf_dir}/events.parquet")
    assert st.isStreaming
    swa = windowed_agg(st, window="1 hour", watermark="0 seconds")
    run_stream_to_memory(swa, "t_wout", output_mode="append")
    stream_rows = spark.sql(
        "select window_start, event_type, n_events, sum_value from t_wout"
    ).collect()
    batch_rows = batch.select("window_start", "event_type", "n_events", "sum_value").collect()
    # watermark=0: all windows emitted except those holding the max event
    assert len(stream_rows) >= len(batch_rows) - 5
    bmap = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in batch_rows}
    for r in stream_rows:
        assert bmap[(r.window_start, r.event_type)] == (r.n_events, r.sum_value)


def test_sessionize_batch_and_session_window_agree_on_count(events):
    a = sessionize_batch(events, gap_seconds=3600)
    b = session_agg(events, gap="1 hour")
    assert a.count() == b.count()
    assert a.agg(F.sum("n_events")).first()[0] == events.count()


def test_session_window_end_extends_gap(events):
    row = session_agg(events, gap="1 hour").first()
    assert (row.session_end - row.session_start).total_seconds() >= 3600
