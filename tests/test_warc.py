"""WARC ingestion (sources/warc): spec-shaped records, per-record gzip
members, truncation tolerance, HTTP splitting."""

import gzip

from polars_dataset_spark.sources.warc import parse_warc, warc_records
from polars_dataset_spark.suite import _warc_record

_HTML = b"<html><body>hi</body></html>"
_HTTP = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + _HTML


def _file(n_responses=1):
    out = _warc_record("warcinfo", None, b"software: t/1\r\n")
    for i in range(n_responses):
        out += _warc_record("response", f"http://e.com/{i}", _HTTP)
    return out


def test_plain_roundtrip():
    recs = parse_warc(_file(2))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[1]["http_status"] == 200
    assert recs[1]["payload"] == _HTML  # HTTP headers split off
    assert recs[1]["target_uri"] == "http://e.com/0"
    assert recs[0]["http_status"] is None


def test_gzip_members():
    gz = b"".join(
        gzip.compress(r)
        for r in (_warc_record("request", "http://a/", b"GET /"),
                  _warc_record("response", "http://a/", _HTTP))
    )
    recs = parse_warc(gz)
    assert len(recs) == 2 and recs[1]["payload"] == _HTML


def test_truncated_tail_keeps_prefix():
    blob = _file(2)
    assert len(parse_warc(blob[:-20])) == 2  # last record dropped
    assert len(parse_warc(blob[:10])) == 0


def test_malformed_inputs():
    assert parse_warc(b"") == []
    assert parse_warc(b"not a warc at all") == []
    # bad Content-Length: stop, don't raise
    bad = _warc_record("response", "http://a/", _HTTP).replace(
        b"Content-Length: %d" % len(_HTTP), b"Content-Length: nope"
    )
    assert parse_warc(bad) == []
    # truncated gzip member: parse what decompressed
    gz = gzip.compress(_warc_record("request", "http://a/", b"GET /"))
    assert parse_warc(gz[: len(gz) // 2]) == []


def test_http_without_full_headers():
    """A response whose payload is not an HTTP message keeps the raw
    payload and a null status."""
    rec = _warc_record("response", "http://a/", b"raw bytes, no http")
    (r,) = parse_warc(rec)
    assert r["http_status"] is None and r["payload"] == b"raw bytes, no http"


def test_warc_records_spark(spark):
    blobs = [
        (0, bytearray(_file(2))),
        (1, bytearray(b"junk")),
        (2, None),
    ]
    df = spark.createDataFrame(blobs, "blob_id long, content binary")
    rows = warc_records(df).collect()
    assert len(rows) == 3  # blob 0 only
    assert {r.blob_id for r in rows} == {0}
    resp = [r for r in rows if r.warc_type == "response"]
    assert all(bytes(r.payload) == _HTML and r.http_status == 200 for r in resp)
    assert [r.rec_idx for r in rows] == [0, 1, 2]
