"""crawl_diff (functions/snapshots): the four statuses, summary
rollup, and disjoint/empty snapshot edges."""

from pyspark.sql import functions as F

from polars_dataset_spark.functions.snapshots import crawl_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, digest string")


def test_four_statuses(spark):
    old = _snap(spark, [("u1", "a"), ("u2", "b"), ("u3", "c")])
    new = _snap(spark, [("u2", "b"), ("u3", "X"), ("u4", "d")])
    got = {r.url: r for r in crawl_diff(old, new).collect()}
    assert got["u1"].status == "removed" and got["u1"].new_digest is None
    assert got["u2"].status == "unchanged"
    assert got["u3"].status == "changed" and got["u3"].old_digest == "c"
    assert got["u4"].status == "added" and got["u4"].old_digest is None
    assert len(got) == 4


def test_summary(spark):
    old = _snap(spark, [("u1", "a"), ("u2", "b")])
    new = _snap(spark, [("u2", "z"), ("u3", "c")])
    got = {
        r.status: r.n
        for r in crawl_diff(old, new, summarize=True).collect()
    }
    assert got == {"removed": 1, "changed": 1, "added": 1}


def test_disjoint_and_empty(spark):
    old = _snap(spark, [("u1", "a")])
    new = _snap(spark, [("u2", "b")])
    got = {r.url: r.status for r in crawl_diff(old, new).collect()}
    assert got == {"u1": "removed", "u2": "added"}
    empty = _snap(spark, []).filter(F.lit(False))
    got2 = {r.url: r.status for r in crawl_diff(empty, new).collect()}
    assert got2 == {"u2": "added"}


def test_custom_columns(spark):
    old = spark.createDataFrame([("k1", "h1")], "page string, sha string")
    new = spark.createDataFrame([("k1", "h2")], "page string, sha string")
    (r,) = crawl_diff(old, new, key_col="page", digest_col="sha").collect()
    assert r.status == "changed"
