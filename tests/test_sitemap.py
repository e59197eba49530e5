"""Sitemap parsing (functions/sitemap, r11): protocol shapes, gzip
sniff, namespace tolerance, hostile inputs, the Spark explode, and the
robots.txt Sitemap: handoff."""

import gzip

from polars_dataset_spark.functions.robots import parse_robots
from polars_dataset_spark.functions.sitemap import parse_sitemap, sitemap_entries

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_urlset_fields_and_loc_required():
    xml = (
        f"<urlset {NS}>"
        "<url><loc>https://x/</loc><lastmod>2026-01-02</lastmod>"
        "<changefreq>weekly</changefreq><priority>0.3</priority></url>"
        "<url><priority>0.9</priority></url>"  # no loc: skipped
        "<url><loc>  https://x/b  </loc></url>"
        "</urlset>"
    ).encode()
    got = parse_sitemap(xml)
    assert got["kind"] == "urlset" and len(got["entries"]) == 2
    assert got["entries"][0] == {
        "loc": "https://x/", "lastmod": "2026-01-02",
        "changefreq": "weekly", "priority": 0.3,
    }
    assert got["entries"][1]["loc"] == "https://x/b"  # whitespace trimmed


def test_sitemapindex_and_gzip_and_bare_namespace():
    idx = (
        f"<sitemapindex {NS}><sitemap><loc>https://x/s1.xml</loc>"
        "</sitemap></sitemapindex>"
    ).encode()
    assert parse_sitemap(idx)["kind"] == "sitemapindex"
    bare = b"<urlset><url><loc>https://y/</loc></url></urlset>"
    assert parse_sitemap(gzip.compress(bare))["entries"][0]["loc"] == "https://y/"
    # exotic prefix: local names decide
    pfx = (
        b'<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<sm:url><sm:loc>https://z/</sm:loc></sm:url></sm:urlset>"
    )
    assert parse_sitemap(pfx)["entries"][0]["loc"] == "https://z/"


def test_hostile_inputs_gate_to_none():
    for blob in (b"", b"not xml", b"<html><body>nope</body></html>",
                 b"\x1f\x8btruncated gzip", b"<urlset>unclosed",
                 "<loc>\x00</loc>".encode()):
        assert parse_sitemap(blob) is None
    assert parse_sitemap(None) is None
    # bogus priority string -> None priority, entry kept
    xml = f"<urlset {NS}><url><loc>https://x/</loc><priority>high</priority></url></urlset>".encode()
    assert parse_sitemap(xml)["entries"][0]["priority"] is None


def test_robots_sitemap_handoff():
    robots = (
        "Sitemap: https://a/sm.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a/sm2.xml.gz\n"
    )
    g = parse_robots(robots, "anybot")
    assert g["sitemaps"] == ["https://a/sm.xml", "https://a/sm2.xml.gz"]
    # Sitemap lines are global: they neither open nor split groups
    assert g["rules"] == [("/x", False)]


def test_sitemap_entries_operator(spark):
    xml = f"<urlset {NS}><url><loc>https://x/</loc></url></urlset>".encode()
    rows = [(0, bytearray(xml)), (1, bytearray(b"junk")), (2, None)]
    df = spark.createDataFrame(rows, "site_id long, content binary")
    got = {(r.site_id, r.entry_idx): r for r in sitemap_entries(df).collect()}
    assert got[(0, 0)].loc == "https://x/" and got[(0, 0)].kind == "urlset"
    assert got[(1, None)].kind is None
    assert got[(2, None)].kind is None
    plan = sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("ensure_parallelism", "")
