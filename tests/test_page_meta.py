"""Page-metadata extraction (functions/html.extract_page_meta /
html_page_meta): OpenGraph, meta description, canonical, published
time, JSON-LD variants, first-wins, and tag-soup tolerance."""

from polars_dataset_spark.functions.html import extract_page_meta, html_page_meta


FULL = """<html><head><title>T</title>
<link rel="canonical" href="http://c.example/d1">
<meta property="og:title" content="OG Title">
<meta property="og:description" content="OG Desc">
<meta property="og:type" content="article">
<meta name="description" content="Plain desc">
<meta property="article:published_time" content="2026-03-01T00:00:00Z">
<script type="application/ld+json">
{"@type": "Article", "headline": "LD Head", "datePublished": "2026-03-02"}
</script>
</head><body><p>body</p></body></html>"""


def test_full_extraction():
    m = extract_page_meta(FULL)
    assert m["og_title"] == "OG Title"
    assert m["og_description"] == "OG Desc"
    assert m["og_type"] == "article"
    assert m["meta_description"] == "Plain desc"
    assert m["canonical"] == "http://c.example/d1"
    assert m["published_time"] == "2026-03-01T00:00:00Z"
    assert m["jsonld_type"] == "Article"
    assert m["jsonld_headline"] == "LD Head"
    assert m["jsonld_date"] == "2026-03-02"


def test_absent_fields_are_none():
    m = extract_page_meta("<html><body><p>no head</p></body></html>")
    assert all(v is None for v in m.values())


def test_first_occurrence_wins():
    html = (
        '<meta property="og:title" content="first">'
        '<meta property="og:title" content="second">'
        '<link rel="canonical" href="u1"><link rel="canonical" href="u2">'
    )
    m = extract_page_meta(html)
    assert m["og_title"] == "first" and m["canonical"] == "u1"


def test_jsonld_array_and_graph():
    arr = '<script type="application/ld+json">[{"@type":"NewsArticle","headline":"A"}]</script>'
    assert extract_page_meta(arr)["jsonld_type"] == "NewsArticle"
    graph = (
        '<script type="application/ld+json">'
        '{"@graph":[{"@type":"Blog","headline":"G"}]}</script>'
    )
    m = extract_page_meta(graph)
    assert m["jsonld_type"] == "Blog" and m["jsonld_headline"] == "G"


def test_jsonld_malformed_yields_nulls():
    bad = '<script type="application/ld+json">{not json]</script>'
    m = extract_page_meta(bad)
    assert m["jsonld_type"] is None and m["jsonld_headline"] is None


def test_entities_decoded_in_content():
    html = '<meta property="og:title" content="A &amp; B">'
    assert extract_page_meta(html)["og_title"] == "A & B"


def test_dataframe_wrapper(spark):
    rows = [
        (1, bytearray(FULL.encode())),
        (2, None),
        (3, bytearray(b"<p>plain</p>")),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    got = {r.id: r for r in html_page_meta(df).collect()}
    assert got[1].og_title == "OG Title" and got[1].jsonld_date == "2026-03-02"
    assert got[2].og_title is None
    assert got[3].canonical is None
