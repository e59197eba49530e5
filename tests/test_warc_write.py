"""WARC write + CDX-J generation (sources/warc.write_warc,
functions/cdx.cdxj_line_col): member offsets/lengths recorded during
the write must address parseable records, the CDX-J text round-trip
must be lossless, and the writer must be deterministic (no clock/RNG
per record)."""

import zlib

from pyspark.sql import functions as F

from polars_dataset_spark.functions.cdx import cdxj_line_col, cdxj_lines
from polars_dataset_spark.sources.warc import (
    build_warc_record,
    parse_warc,
    warc_record_at,
    write_warc,
)


def test_build_warc_record_parses_back():
    rec = build_warc_record("response", "http://e.example/a", b"<p>hi</p>")
    parsed = parse_warc(rec)
    assert len(parsed) == 1
    r = parsed[0]
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "http://e.example/a"
    assert r["http_status"] == 200
    assert r["payload"] == b"<p>hi</p>"


def test_build_warc_record_deterministic():
    a = build_warc_record("response", "http://e.example/a", b"x")
    b = build_warc_record("response", "http://e.example/a", b"x")
    assert a == b


def _records_df(spark, n=7):
    rows = [
        (
            f"http://h{i % 2}.example/p{i}",
            bytearray(f"payload-{i}".encode()),
            f"f{i % 2}.warc.gz",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, payload binary, warc_filename string"
    )


def test_write_warc_offsets_address_members(spark):
    files = {
        r["warc_filename"]: r
        for r in write_warc(_records_df(spark)).collect()
    }
    assert set(files) == {"f0.warc.gz", "f1.warc.gz"}
    for fname, row in files.items():
        blob = bytes(row["content"])
        total = 0
        for rec in row["records"]:
            off, ln = rec["warc_offset"], rec["warc_length"]
            member = blob[off : off + ln]
            assert member[:2] == b"\x1f\x8b"  # its own gzip member
            # the ranged fetch path must parse exactly this record
            got = warc_record_at(blob, off, ln)
            assert got is not None and got["target_uri"] == rec["url"]
            # member is self-terminating: inflating it yields one record
            d = zlib.decompressobj(wbits=31)
            one = d.decompress(member)
            assert d.eof and parse_warc(one)[0]["target_uri"] == rec["url"]
            total += ln
        assert total == len(blob)  # members tile the file exactly


def test_write_warc_payloads_roundtrip(spark):
    files = write_warc(_records_df(spark)).collect()
    seen = {}
    for row in files:
        blob = bytes(row["content"])
        for rec in row["records"]:
            got = warc_record_at(blob, rec["warc_offset"], rec["warc_length"])
            seen[got["target_uri"]] = got["payload"]
    for i in range(7):
        assert seen[f"http://h{i % 2}.example/p{i}"] == f"payload-{i}".encode()


def test_cdxj_line_roundtrip(spark):
    df = spark.createDataFrame(
        [
            ("http://E.example:80/A?b=1#frag", "20260101000000",
             "text/html", 200, "sha1:ABC", 123, 456, "f.warc.gz"),
            ("not a url", "20260101000000",
             "text/html", 200, "sha1:X", 1, 2, "f.warc.gz"),
        ],
        "url string, ts string, mime string, http_status int,"
        " digest string, warc_length long, warc_offset long,"
        " warc_filename string",
    )
    lines = df.select(
        cdxj_line_col(
            F.col("url"), F.col("ts"), F.col("mime"), F.col("http_status"),
            F.col("digest"), F.col("warc_length"), F.col("warc_offset"),
            F.col("warc_filename"),
        ).alias("value")
    )
    rows = lines.collect()
    assert rows[1]["value"] is None  # unkeyed URL -> no index line
    parsed = cdxj_lines(lines.filter(F.col("value").isNotNull())).collect()
    assert len(parsed) == 1
    p = parsed[0]
    assert p["surt"] == "example,e)/a?b=1"  # lowercased, :80 dropped, fragment dropped
    assert p["url"] == "http://E.example:80/A?b=1#frag"
    assert (p["warc_offset"], p["warc_length"]) == (456, 123)
    assert p["http_status"] == 200 and p["warc_filename"] == "f.warc.gz"


def test_write_warc_deterministic_across_runs(spark):
    a = {r["warc_filename"]: bytes(r["content"])
         for r in write_warc(_records_df(spark)).collect()}
    b = {r["warc_filename"]: bytes(r["content"])
         for r in write_warc(_records_df(spark)).collect()}
    assert a == b


# --------------------------------------------------- revisit dedup (r12)

def test_mark_revisits_canonical_is_lexicographic_min(spark):
    rows = [
        ("http://b.example/x", bytearray(b"same")),
        ("http://a.example/x", bytearray(b"same")),
        ("http://c.example/y", bytearray(b"unique")),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    from polars_dataset_spark.sources.warc import mark_revisits

    got = {r["url"]: r["revisit_of"] for r in mark_revisits(df).collect()}
    assert got["http://a.example/x"] is None  # canonical
    assert got["http://b.example/x"] == "http://a.example/x"
    assert got["http://c.example/y"] is None


def test_revisit_records_roundtrip_through_bytes(spark):
    from polars_dataset_spark.sources.warc import (
        mark_revisits,
        warc_records,
        write_warc,
    )

    # realistic page-sized payload: the revisit member must be smaller
    # than the response it mirrors. Deterministic but INCOMPRESSIBLE
    # body — a repeated phrase deflates to ~nothing inside the gzip
    # member and the comparison would measure header sizes instead.
    import hashlib

    body = b"".join(
        hashlib.sha256(i.to_bytes(4, "big")).digest() for i in range(64)
    )
    rows = [
        ("http://a.example/1", bytearray(body), "f.warc.gz"),
        ("http://a.example/2", bytearray(body), "f.warc.gz"),
        ("http://a.example/3", bytearray(b"other"), "f.warc.gz"),
    ]
    df = spark.createDataFrame(
        rows, "url string, payload binary, warc_filename string"
    )
    files = write_warc(mark_revisits(df), revisit_col="revisit_of")
    row = files.collect()[0]
    kinds = {r["url"]: r["kind"] for r in row["records"]}
    assert kinds == {
        "http://a.example/1": "response",
        "http://a.example/2": "revisit",
        "http://a.example/3": "response",
    }
    # the revisit member is much smaller than the response it mirrors
    sizes = {r["url"]: r["warc_length"] for r in row["records"]}
    assert sizes["http://a.example/2"] < sizes["http://a.example/1"]
    # digests equal across the dup pair
    digs = {r["url"]: r["digest"] for r in row["records"]}
    assert digs["http://a.example/1"] == digs["http://a.example/2"]
    # and the SERIALIZED bytes parse back with type/refers_to/empty body
    parsed = {
        r["target_uri"]: r
        for r in warc_records(
            files.select("warc_filename", "content")
        ).collect()
    }
    rv = parsed["http://a.example/2"]
    assert rv["warc_type"] == "revisit"
    assert rv["refers_to"] == "http://a.example/1"
    assert bytes(rv["payload"]) == b""
    assert bytes(parsed["http://a.example/1"]["payload"]) == body
    assert parsed["http://a.example/1"]["refers_to"] is None


def test_write_warc_without_revisit_col_unchanged(spark):
    # the q231 path (no revisit_col): every record is a response
    from polars_dataset_spark.sources.warc import write_warc

    files = write_warc(_records_df(spark)).collect()
    for row in files:
        assert all(r["kind"] == "response" for r in row["records"])
        assert all(r["refers_to"] is None for r in row["records"])


def test_write_wet_conversion_records(spark):
    import base64
    import hashlib

    from polars_dataset_spark.sources.warc import warc_records, write_wet

    rows = [
        ("w.warc.gz", "http://a.example/1", "alpha text"),
        ("w.warc.gz", "http://a.example/2", "beta text"),
    ]
    df = spark.createDataFrame(rows, "wet_filename string, url string, text string")
    files = write_wet(df)
    (row,) = files.collect()
    # members carry kind=conversion, no status, CC-style sha1 digest of
    # the TEXT bytes
    recs = {r["url"]: r for r in row["records"]}
    assert all(r["kind"] == "conversion" for r in recs.values())
    assert all(r["http_status"] is None for r in recs.values())
    want = "sha1:" + base64.b32encode(hashlib.sha1(b"alpha text").digest()).decode()
    assert recs["http://a.example/1"]["digest"] == want
    # serialized bytes parse back as conversion records with exact text
    parsed = {
        r["target_uri"]: r
        for r in warc_records(files.select("wet_filename", "content")).collect()
    }
    assert parsed["http://a.example/1"]["warc_type"] == "conversion"
    assert parsed["http://a.example/1"]["content_type"] == "text/plain"
    assert bytes(parsed["http://a.example/2"]["payload"]) == b"beta text"


def test_write_warc_redirect_records(spark):
    from polars_dataset_spark.sources.warc import warc_records, write_warc

    rows = [
        ("r.warc.gz", "http://a.example/old", b"", 301, "/new"),
        ("r.warc.gz", "http://a.example/ok", b"hi", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "warc_filename string, url string, payload binary, "
        "status int, location string",
    )
    files = write_warc(df, status_col="status", location_col="location")
    parsed = {
        r["target_uri"]: r
        for r in warc_records(files.select("warc_filename", "content")).collect()
    }
    assert parsed["http://a.example/old"]["http_status"] == 301
    assert parsed["http://a.example/old"]["http_location"] == "/new"
    assert parsed["http://a.example/ok"]["http_status"] == 200
    assert parsed["http://a.example/ok"]["http_location"] is None


def test_write_wat_metadata_records(spark):
    from pyspark.sql import functions as F

    from polars_dataset_spark.sources.warc import warc_records, write_wat

    rows = [("w.warc.gz", "http://a.example/1", "T1", 3)]
    df = spark.createDataFrame(
        rows, "wat_filename string, url string, title string, n_links int"
    ).withColumn("meta", F.struct("title", "n_links"))
    files = write_wat(df)
    (row,) = files.collect()
    assert row["records"][0]["kind"] == "metadata"
    parsed = warc_records(files.select("wat_filename", "content")).collect()
    (rec,) = parsed
    assert rec["warc_type"] == "metadata"
    assert rec["content_type"] == "application/json"
    import json

    body = json.loads(bytes(rec["payload"]).decode())
    assert body == {"title": "T1", "n_links": 3}
