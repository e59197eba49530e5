"""Redirect-chain resolution (functions/redirects + the warc.py
``http_location`` surface): Location-header resolution forms, WARC 3xx
round-trip, pointer-jumping termination (chains, loops, over-length
chains), and edge-map determinism."""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions.redirects import (
    extract_redirect_edges,
    resolve_location_col,
    resolve_redirects,
)
from polars_dataset_spark.sources.warc import build_warc_record, parse_warc


def _resolve(spark, base, loc):
    return (
        spark.range(1)
        .select(resolve_location_col(F.lit(base), F.lit(loc)).alias("r"))
        .first()
        .r
    )


def test_location_absolute_taken_as_is(spark):
    assert (
        _resolve(spark, "http://a.example/x", "https://b.example/y")
        == "https://b.example/y"
    )


def test_location_protocol_relative(spark):
    assert (
        _resolve(spark, "https://a.example/x", "//cdn.example/y")
        == "https://cdn.example/y"
    )


def test_location_absolute_path(spark):
    assert (
        _resolve(spark, "http://a.example:8080/x/y?q=1", "/z")
        == "http://a.example:8080/z"
    )


def test_location_relative_path_merges_with_base_dir(spark):
    assert (
        _resolve(spark, "http://a.example/dir/sub/page.html", "other.html")
        == "http://a.example/dir/sub/other.html"
    )
    # empty base path -> root
    assert _resolve(spark, "http://a.example", "p") == "http://a.example/p"
    assert _resolve(spark, "http://a.example/", "p") == "http://a.example/p"


def test_location_gates(spark):
    assert _resolve(spark, "http://a.example/x", "") is None
    assert _resolve(spark, "not a url", "/z") is None
    assert _resolve(spark, "not a url", "rel") is None
    # but an absolute Location survives a junk base
    assert _resolve(spark, "not a url", "http://b.example/") == "http://b.example/"


def test_parse_warc_captures_location():
    rec = build_warc_record(
        "response",
        "http://a.example/old",
        b"",
        http_status=301,
        http_headers={"Location": "http://a.example/new"},
    )
    out = parse_warc(rec)
    assert len(out) == 1
    assert out[0]["http_status"] == 301
    assert out[0]["http_location"] == "http://a.example/new"
    # a 200 without Location stays null
    ok = parse_warc(build_warc_record("response", "http://a.example/p", b"hi"))
    assert ok[0]["http_location"] is None and ok[0]["payload"] == b"hi"


def test_extract_redirect_edges_filters_and_resolves(spark):
    rows = [
        ("http://a.example/1", 301, "/2"),
        ("http://a.example/ok", 200, None),
        ("http://a.example/loop", 302, "/loop"),  # self-loop: dropped
        ("http://a.example/bad", 301, None),  # no Location: dropped
        ("http://a.example/rel", 307, "next"),
    ]
    df = spark.createDataFrame(
        rows, "target_uri string, http_status int, http_location string"
    )
    got = {
        r.src: r.dst for r in extract_redirect_edges(df).collect()
    }
    assert got == {
        "http://a.example/1": "http://a.example/2",
        "http://a.example/rel": "http://a.example/next",
    }


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_resolve_chain_and_terminal(spark):
    e = _edges(
        spark,
        [("u3", "u2"), ("u2", "u1"), ("u1", "u0"), ("v1", "v0")],
    )
    got = {r.src: r for r in resolve_redirects(e, max_hops=8).collect()}
    assert got["u3"].final_url == "u0" and got["u3"].hops == 3
    assert got["u2"].final_url == "u0" and got["u2"].hops == 2
    assert got["u1"].final_url == "u0" and got["u1"].hops == 1
    assert got["v1"].final_url == "v0" and got["v1"].hops == 1
    assert all(r.resolved for r in got.values())


def test_resolve_cycle_flagged_not_guessed(spark):
    e = _edges(spark, [("a", "b"), ("b", "a"), ("c", "a")])
    got = {r.src: r for r in resolve_redirects(e, max_hops=8).collect()}
    for s in ("a", "b", "c"):
        assert got[s].resolved is False
        assert got[s].final_url is None and got[s].hops is None


def test_resolve_chain_longer_than_max_hops_unresolved(spark):
    chain = [(f"n{i}", f"n{i - 1}") for i in range(1, 6)]  # n5 -> ... -> n0
    got = {
        r.src: r
        for r in resolve_redirects(_edges(spark, chain), max_hops=4).collect()
    }
    assert got["n4"].resolved and got["n4"].hops == 4
    assert not got["n5"].resolved  # 5 hops > max_hops=4


def test_resolve_duplicate_src_tiebreak_is_max(spark):
    e = _edges(spark, [("s", "t1"), ("s", "t9")])
    (row,) = resolve_redirects(e, max_hops=2).collect()
    assert row.final_url == "t9" and row.hops == 1


def test_max_hops_must_be_power_of_two(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_edges(spark, [("a", "b")]), max_hops=3)


def test_warc_roundtrip_to_resolution(spark):
    recs = b"".join(
        [
            build_warc_record(
                "response", "http://s.example/a", b"",
                http_status=301,
                http_headers={"Location": "/b"},
            ),
            build_warc_record(
                "response", "http://s.example/b", b"",
                http_status=302,
                http_headers={"Location": "http://s.example/final"},
            ),
            build_warc_record(
                "response", "http://s.example/final", b"<p>done</p>"
            ),
        ]
    )
    from polars_dataset_spark.sources.warc import warc_records

    blobs = spark.createDataFrame(
        [("f.warc", bytearray(recs))], "filename string, content binary"
    )
    parsed = warc_records(blobs)
    edges = extract_redirect_edges(parsed)
    got = {r.src: r for r in resolve_redirects(edges, max_hops=4).collect()}
    assert got["http://s.example/a"].final_url == "http://s.example/final"
    assert got["http://s.example/a"].hops == 2
    assert got["http://s.example/b"].hops == 1


def test_meta_refresh_edges(spark):
    from polars_dataset_spark.functions.redirects import (
        extract_meta_refresh_edges,
    )

    rows = [
        ("http://a.example/1",
         '<meta http-equiv="refresh" content="0;url=/2"><p>x</p>'),
        ("http://a.example/3",
         '<meta content="5; URL=http://b.example/z" http-equiv="refresh">'),
        ("http://a.example/4", "<p>no refresh</p>"),
        ("http://a.example/5",
         '<meta http-equiv="refresh" content="30">'),  # reload, no url
        ("http://a.example/6",
         '<META HTTP-EQUIV=REFRESH CONTENT="0; url=next.html">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r.src: r.dst for r in extract_meta_refresh_edges(df).collect()}
    assert got == {
        "http://a.example/1": "http://a.example/2",
        "http://a.example/3": "http://b.example/z",
        "http://a.example/6": "http://a.example/next.html",
    }


def test_declared_lang_extraction(spark):
    from polars_dataset_spark.functions.html import with_declared_lang

    rows = [
        (0, '<html lang="de"><body>x</body></html>'),
        (1, "<html LANG='ES-419'><body>x</body></html>"),
        (2, '<html dir="ltr" lang=fr><body>x</body></html>'),
        (3, "<html><body>no lang</body></html>"),
        (4, '<div lang="en">not the html tag</div>'),
    ]
    df = spark.createDataFrame(rows, "id int, html string")
    got = {r.id: r.declared_lang for r in with_declared_lang(df).collect()}
    assert got == {0: "de", 1: "es", 2: "fr", 3: None, 4: None}
