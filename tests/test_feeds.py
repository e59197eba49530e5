"""RSS/Atom feed parsing (functions/feeds): format coverage, the
linkless-entry skip rule, alternate-link preference, gzip-bomb bound,
and the junk/empty gates."""

import zlib

from polars_dataset_spark.functions.feeds import parse_feed

RSS = (
    b'<rss version="2.0"><channel><title>T</title>'
    b"<item><title>a</title><link>http://x/1</link>"
    b"<pubDate>Mon, 10 Aug 2026 08:00:00 GMT</pubDate><guid>g1</guid></item>"
    b"<item><title>linkless</title></item>"
    b"</channel></rss>"
)


def test_rss_basic():
    f = parse_feed(RSS)
    assert f["kind"] == "rss" and f["title"] == "T"
    assert len(f["entries"]) == 1  # linkless item skipped
    e = f["entries"][0]
    assert e["link"] == "http://x/1" and e["entry_id"] == "g1"
    assert e["published"] == "Mon, 10 Aug 2026 08:00:00 GMT"


def test_atom_alternate_link_preferred():
    atom = (
        b'<feed xmlns="http://www.w3.org/2005/Atom"><title>B</title>'
        b'<entry><link rel="enclosure" href="http://x/a.mp3"/>'
        b'<link rel="alternate" href="http://x/a"/>'
        b"<updated>2026-01-01T00:00:00Z</updated></entry>"
        b'<entry><link rel="enclosure" href="http://x/only.mp3"/></entry>'
        b"</feed>"
    )
    f = parse_feed(atom)
    assert f["kind"] == "atom"
    assert f["entries"][0]["link"] == "http://x/a"
    # no alternate at all: any href is the fallback
    assert f["entries"][1]["link"] == "http://x/only.mp3"


def test_atom_published_fallback():
    atom = (
        b"<feed><entry><link href='http://x/p'/>"
        b"<published>2026-02-02T00:00:00Z</published></entry></feed>"
    )
    assert parse_feed(atom)["entries"][0]["published"] == "2026-02-02T00:00:00Z"


def test_rdf_rss10_top_level_items():
    rdf = (
        b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        b' xmlns="http://purl.org/rss/1.0/">'
        b"<channel><title>C</title></channel>"
        b"<item><link>http://x/r</link><dc:date"
        b' xmlns:dc="http://purl.org/dc/elements/1.1/">2026-03-03</dc:date>'
        b"</item></rdf:RDF>"
    )
    f = parse_feed(rdf)
    assert f["kind"] == "rss" and f["title"] == "C"
    assert f["entries"][0]["published"] == "2026-03-03"


def test_gzip_feed_and_bomb_bound():
    atom = b"<feed><title>Z</title></feed>"
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    assert parse_feed(co.compress(atom) + co.flush())["kind"] == "atom"
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    bomb = co.compress(b"\x00" * (200 << 20)) + co.flush()
    assert len(bomb) < (1 << 20)
    assert parse_feed(bomb) is None  # bounded inflate, not valid XML


def test_gates():
    assert parse_feed(b"not xml") is None
    assert parse_feed(b"<html><body/></html>") is None
    assert parse_feed(b"") is None
    empty = parse_feed(b"<feed><title>E</title></feed>")
    assert empty["kind"] == "atom" and empty["entries"] == []
