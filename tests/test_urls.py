"""URL parsing + domain blocklist (functions/urls.py)."""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import (
    filter_url_blocklist,
    registered_domain_col,
    with_url_parts,
)


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (0, "https://www.news.example/a/b/c?x=1&y=2#frag"),
        (1, "http://sub.deep.shop.co.uk:8080/p"),
        (2, "ftp://10.1.2.3/f"),
        (3, "garbage without scheme"),
        (4, "https://user:pw@secure.example/q"),
        (5, "https://bare.example"),
        (6, None),
        (7, "https://spam.example/x"),
        (8, "https://a.spam.example/y"),
    ]
    return spark.createDataFrame(rows, "id long, url string")


def test_parts(urls):
    p = {r["id"]: r for r in with_url_parts(urls).collect()}
    r0 = p[0]
    assert (r0["scheme"], r0["host"], r0["port"]) == ("https", "www.news.example", None)
    assert r0["path"] == "/a/b/c" and r0["n_path_segments"] == 3
    assert r0["query"] == "x=1&y=2" and r0["n_query_params"] == 2
    assert r0["domain"] == "news.example"
    r1 = p[1]
    assert r1["port"] == 8080 and r1["host"] == "sub.deep.shop.co.uk"
    assert r1["domain"] == "shop.co.uk"  # multi-part public suffix
    r2 = p[2]
    assert r2["host"] == "10.1.2.3" and r2["domain"] == "10.1.2.3"  # IP passthrough
    r3 = p[3]
    assert r3["scheme"] is None and r3["host"] is None and r3["domain"] is None
    assert r3["n_path_segments"] == 0 and r3["n_query_params"] == 0
    r4 = p[4]
    assert r4["host"] == "secure.example"  # userinfo stripped
    r5 = p[5]
    assert r5["path"] is None and r5["n_path_segments"] == 0
    assert p[6]["domain"] is None


def test_registered_domain_edge_cases(spark):
    df = spark.createDataFrame(
        [("localhost",), ("example",), ("x.example",), ("a.b.c.gov.uk",)], "h string"
    )
    out = [r[0] for r in df.select(registered_domain_col(F.col("h"))).collect()]
    assert out == ["localhost", "example", "x.example", "c.gov.uk"]


def test_blocklist_catches_subdomains(urls):
    kept = filter_url_blocklist(urls, ["spam.example"])
    ids = {r["id"] for r in kept.collect()}
    # 7 (exact) and 8 (subdomain) blocked; 3 and 6 unparseable dropped
    assert ids == {0, 1, 2, 4, 5}
    with_unparseable = filter_url_blocklist(urls, ["spam.example"], keep_unparseable=True)
    assert {r["id"] for r in with_unparseable.collect()} == {0, 1, 2, 3, 4, 5, 6}
    # the plain path returns the original schema untouched
    assert kept.columns == urls.columns


def test_blocklist_is_broadcast(urls):
    from tests.test_plans import explain_str

    kept = filter_url_blocklist(urls, ["spam.example"])
    text = explain_str(kept)
    assert "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" not in text
    assert "SortMergeJoin" not in text
