"""Regression pins for the five ADVICE r11 findings (fixed in r12):

- pii.py SSN area group must cover 001-899 except 666 (the old class
  excluded all of 600-699 and 010-090 — an under-redaction PII leak);
- robots.py must MERGE rules across all groups tying the winning
  user-agent specificity (RFC 9309 §2.2.1 "crawlers MUST combine");
- sitemap.py must bound the UNCOMPRESSED gzip output before
  allocation (a 50 MB bomb inflates to ~50 GB);
- cdx.py / urls.py query regex must not match a '?' that occurs
  after the fragment '#';
- suite q224 must not collect() the good frame to the driver
  (localCheckpoint materialization — pinned by source inspection).
"""

import re
import zlib

import pytest

from polars_dataset_spark.functions.pii import PII_PATTERNS
from polars_dataset_spark.functions.robots import parse_robots
from polars_dataset_spark.functions.sitemap import parse_sitemap
from polars_dataset_spark.functions.urls import _QUERY_RE


# ---------------------------------------------------------------- SSN

_SSN = re.compile(PII_PATTERNS["ssn"])


@pytest.mark.parametrize(
    "ssn",
    ["612-34-5678", "010-23-4567", "001-12-0001", "899-99-9999",
     "660-12-3456", "667-01-0001"],
)
def test_ssn_valid_areas_match(ssn):
    assert _SSN.search(f"my ssn is {ssn} ok"), ssn


@pytest.mark.parametrize(
    "ssn",
    ["000-12-3456", "666-12-3456", "900-12-3456", "987-65-4321",
     "123-00-4567", "123-45-0000"],
)
def test_ssn_invalid_parts_do_not_match(ssn):
    assert not _SSN.search(f"my ssn is {ssn} ok"), ssn


# ------------------------------------------------------------- robots

def test_robots_duplicate_star_groups_merge():
    txt = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\nCrawl-delay: 2\n"
    )
    parsed = parse_robots(txt, "anybot")
    assert parsed["rules"] == [("/a", False), ("/b", False)]
    assert parsed["crawl_delay"] == 2.0


def test_robots_repeated_product_token_merges():
    txt = (
        "User-agent: graftbot\nDisallow: /x\nCrawl-delay: 5\n\n"
        "User-agent: other\nDisallow: /everything\n\n"
        "User-agent: graftbot\nAllow: /x/ok\nCrawl-delay: 3\n"
    )
    parsed = parse_robots(txt, "GraftBot/1.0")
    assert parsed["rules"] == [("/x", False), ("/x/ok", True)]
    # max across merged groups — the polite choice on conflict
    assert parsed["crawl_delay"] == 5.0
    assert parsed["matched_ua"] == "graftbot"


def test_robots_specific_beats_star_and_star_groups_do_not_leak():
    txt = (
        "User-agent: *\nDisallow: /all\n\n"
        "User-agent: graftbot\nDisallow: /gb\n"
    )
    parsed = parse_robots(txt, "graftbot")
    assert parsed["rules"] == [("/gb", False)]


def test_robots_star_fallback_unchanged_single_group():
    txt = "User-agent: *\nDisallow: /private\nCrawl-delay: 1.5\n"
    parsed = parse_robots(txt, "whoever")
    assert parsed["rules"] == [("/private", False)]
    assert parsed["crawl_delay"] == 1.5


# ------------------------------------------------------------ sitemap

def test_sitemap_gzip_bomb_bounded():
    # ~200 MB of zeros compresses to ~200 KB; the parser must never
    # allocate the inflated size — bounded inflate caps at 50 MB and
    # the result is not valid XML, so the verdict is None (not OOM).
    bomb = zlib.compress(b"\x00" * (200 << 20), 9)
    # gzip wrapper (wbits=31 accepts gzip framing)
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    bomb = co.compress(b"\x00" * (200 << 20)) + co.flush()
    assert len(bomb) < (1 << 20)
    assert parse_sitemap(bomb) is None


def test_sitemap_normal_gzip_still_parses():
    xml = (
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://e.example/p</loc></url></urlset>"
    )
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    blob = co.compress(xml) + co.flush()
    parsed = parse_sitemap(blob)
    assert parsed["kind"] == "urlset"
    assert parsed["entries"][0]["loc"] == "https://e.example/p"


def test_sitemap_truncated_gzip_returns_none():
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    blob = (co.compress(b"<urlset></urlset>") + co.flush())[:5]
    assert parse_sitemap(blob) is None


# ---------------------------------------------------------------- cdx

def test_query_regex_ignores_question_mark_in_fragment():
    rx = re.compile(_QUERY_RE)
    assert rx.search("http://example.com/p#a?b") is None
    m = rx.search("http://example.com/p?x=1#frag?y")
    assert m and m.group(1) == "x=1"


def test_surt_key_fragment_does_not_leak(spark):
    from polars_dataset_spark.functions.cdx import with_surt

    df = spark.createDataFrame(
        [("http://example.com/p#a?b",), ("http://example.com/p?b",)],
        "url string",
    )
    keys = [r.surt for r in with_surt(df).orderBy("url").collect()]
    assert keys == ["com,example)/p", "com,example)/p?b"]


def test_canonical_url_fragment_query_dropped(spark):
    from polars_dataset_spark.functions.urls import canonicalize_url

    df = spark.createDataFrame([("http://h.example/p#a?b=1",)], "url string")
    assert (
        canonicalize_url(df).head().url_canon == "http://h.example/p"
    )


# --------------------------------------------------------------- q224

def test_q224_does_not_collect_good_frame():
    import inspect

    from polars_dataset_spark import suite

    src = inspect.getsource(suite.q224)
    assert ".collect()" not in src
    assert "localCheckpoint" in src
