"""CDX-J index + SURT keys (functions/cdx, r11): key transform edge
cases, line parsing incl. malformed/partial payloads, the gzip file
read path, and the fetch-planning projection."""

import gzip

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions.cdx import (
    cdxj_lines,
    read_cdxj,
    surt_col,
    with_surt,
)


def _surt(spark, url):
    return spark.range(1).select(surt_col(F.lit(url)).alias("s")).first().s


def test_surt_key_transform(spark):
    assert _surt(spark, "https://www.Example.COM/Path?Q=1") == (
        "com,example,www)/path?q=1"
    )
    assert _surt(spark, "http://example.com:80/") == "com,example)/"
    assert _surt(spark, "http://example.com:8080/x") == "com,example:8080)/x"
    assert _surt(spark, "https://example.com") == "com,example)/"
    assert _surt(spark, "https://a.b.co.uk/p#frag") == "uk,co,b,a)/p"
    assert _surt(spark, "not a url") is None
    assert _surt(spark, "mailto:x@y.z") is None


def test_cdxj_lines_parse_and_gates(spark):
    rows = [
        (0, 'com,example)/ 20260101120000 {"url": "https://example.com/", '
            '"mime": "text/html", "status": "200", "digest": "sha1:AB", '
            '"length": "2526", "offset": "845", "filename": "c.warc.gz"}'),
        (1, 'com,host)/ 20260202020202 {"url": "https://host.com/", "status": "301"}'),
        (2, "garbage line"),
    ]
    df = spark.createDataFrame(rows, "line_id long, value string")
    got = {r.line_id: r for r in cdxj_lines(df).collect()}
    r0 = got[0]
    assert r0.surt == "com,example)/" and r0.ts == "20260101120000"
    assert r0.http_status == 200 and r0.warc_length == 2526
    assert r0.warc_offset == 845 and r0.warc_filename == "c.warc.gz"
    r1 = got[1]
    assert r1.http_status == 301 and r1.mime is None and r1.warc_length is None
    r2 = got[2]
    assert r2.surt is None and r2.ts is None and r2.url is None


def test_read_cdxj_gz_and_fetch_projection(spark, tmp_path):
    lines = "\n".join(
        f'com,example)/p{i} 2026010112000{i} '
        f'{{"url": "https://example.com/p{i}", "mime": "text/html", '
        f'"status": "200", "digest": "sha1:D{i}", "length": "{100 + i}", '
        f'"offset": "{i * 1000}", "filename": "crawl-{i % 2}.warc.gz"}}'
        for i in range(6)
    )
    p = tmp_path / "idx"
    p.mkdir()
    with open(p / "part.cdxj.gz", "wb") as fh:
        fh.write(gzip.compress(lines.encode()))
    idx = read_cdxj(spark, str(p))
    # the fetch plan: filter by key/status, project file+range
    plan = idx.filter(
        (F.col("surt").startswith("com,example)")) & (F.col("http_status") == 200)
    ).select("warc_filename", "warc_offset", "warc_length")
    rows = plan.collect()
    assert len(rows) == 6 and {r.warc_filename for r in rows} == {
        "crawl-0.warc.gz", "crawl-1.warc.gz"
    }
    ex = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in ex  # scan -> filter -> project, zero shuffles


def test_with_surt_matches_index_key(spark):
    # the key computed from the payload URL must equal the line's key
    line = (
        'org,site:8080)/x?a=1 20251231235959 '
        '{"url": "http://site.org:8080/X?a=1", "status": "404"}'
    )
    df = cdxj_lines(spark.createDataFrame([(line,)], "value string"))
    r = with_surt(df, url_col="url", out_col="url_surt").first()
    assert r.url_surt == r.surt == "org,site:8080)/x?a=1"
