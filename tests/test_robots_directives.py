"""with_robots_directives (functions/html): meta robots in both
attribute orders, 'none' implication, X-Robots-Tag OR-merge, token
boundaries, and absent-signal defaults."""

from pyspark.sql import functions as F

from polars_dataset_spark.functions.html import with_robots_directives


def _run(spark, rows, header=False):
    if header:
        df = spark.createDataFrame(rows, "id int, html string, xrt string")
        out = with_robots_directives(df, header_col="xrt")
    else:
        df = spark.createDataFrame(rows, "id int, html string")
        out = with_robots_directives(df)
    return {r.id: (r.noindex, r.nofollow) for r in out.collect()}


def test_meta_name_first(spark):
    got = _run(
        spark,
        [
            (0, '<meta name="robots" content="noindex, nofollow">'),
            (1, '<meta name="robots" content="index, follow">'),
            (2, '<meta name="robots" content="nofollow">'),
            (3, '<meta name="robots" content="none">'),
            (4, "<p>no meta at all</p>"),
        ],
    )
    assert got[0] == (True, True)
    assert got[1] == (False, False)
    assert got[2] == (False, True)
    assert got[3] == (True, True)  # none implies both
    assert got[4] == (False, False)


def test_meta_content_first_and_case(spark):
    got = _run(
        spark,
        [
            (0, "<META CONTENT='NOINDEX' NAME='ROBOTS'>"),
            (1, '<meta content="nofollow" name="robots">'),
        ],
    )
    assert got[0] == (True, False)
    assert got[1] == (False, True)


def test_token_boundaries_not_substrings(spark):
    # 'noindexing' must NOT trip noindex
    got = _run(
        spark, [(0, '<meta name="robots" content="noindexing,archive">')]
    )
    assert got[0] == (False, False)


def test_other_meta_does_not_match(spark):
    got = _run(
        spark,
        [(0, '<meta name="viewport" content="noindex"><p>x</p>')],
    )
    assert got[0] == (False, False)


def test_header_or_merge(spark):
    got = _run(
        spark,
        [
            (0, "<p>x</p>", "noindex"),
            (1, '<meta name="robots" content="nofollow">', "noindex"),
            (2, "<p>x</p>", None),
        ],
        header=True,
    )
    assert got[0] == (True, False)
    assert got[1] == (True, True)
    assert got[2] == (False, False)


def test_first_robots_meta_wins(spark):
    got = _run(
        spark,
        [
            (0,
             '<meta name="robots" content="index">'
             '<meta name="robots" content="noindex">'),
        ],
    )
    assert got[0] == (False, False)
