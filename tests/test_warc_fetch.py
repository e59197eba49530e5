"""CDX -> WARC ranged fetch (sources/warc.warc_record_at /
fetch_warc_records, r11): member slicing, plain ranges, bogus ranges,
and the broadcast-only plan."""

import gzip

from pyspark.sql import functions as F

from polars_dataset_spark.sources import fetch_warc_records, warc_record_at
from polars_dataset_spark.suite import _warc_record


def _resp(uri: str, body: bytes) -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    return _warc_record(
        "response", uri, http, "Content-Type: application/http; msgtype=response\r\n"
    )


def test_warc_record_at_gz_member_and_plain():
    m1 = gzip.compress(_resp("http://x/1", b"one"), mtime=0)
    m2 = gzip.compress(_resp("http://x/2", b"two"), mtime=0)
    blob = m1 + m2
    r2 = warc_record_at(blob, len(m1), len(m2))
    assert r2["target_uri"] == "http://x/2" and r2["payload"] == b"two"
    plain = _resp("http://x/3", b"three")
    assert warc_record_at(plain, 0, len(plain))["payload"] == b"three"
    # out-of-bounds / junk ranges gate to None
    assert warc_record_at(blob, len(m1), len(m2) + 99) is None
    assert warc_record_at(blob, 3, 10) is None
    assert warc_record_at(blob, -1, 5) is None


def test_fetch_plan_broadcasts_index_and_never_shuffles_blobs(spark):
    m = gzip.compress(_resp("http://x/1", b"one"), mtime=0)
    blobs = spark.createDataFrame(
        [("f.warc.gz", bytearray(m))], "filename string, content binary"
    )
    index = spark.createDataFrame(
        [("f.warc.gz", 0, len(m))],
        "warc_filename string, warc_offset long, warc_length long",
    )
    out = fetch_warc_records(blobs, index)
    assert [r.target_uri for r in out.collect()] == ["http://x/1"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # the only exchange is the index-side aggregate (tiny); blob rows
    # flow scan -> broadcast-join -> mapInPandas
    assert "CartesianProduct" not in plan
