"""with_cache_hints (functions/recrawl): directive extraction,
s-maxage precedence, token boundaries, null header gates."""

from polars_dataset_spark.functions.recrawl import with_cache_hints


def _run(spark, headers):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(headers)], "id int, cache_control string"
    )
    return {r.id: r for r in with_cache_hints(df).collect()}


def test_max_age_and_flags(spark):
    got = _run(
        spark,
        [
            "public, max-age=3600",
            "no-cache, no-store",
            "private",
            None,
        ],
    )
    assert got[0].cc_max_age_sec == 3600
    assert not got[0].cc_no_store and not got[0].cc_no_cache
    assert got[1].cc_no_store and got[1].cc_no_cache
    assert got[1].cc_max_age_sec is None
    assert got[2].cc_max_age_sec is None
    assert got[3].cc_max_age_sec is None
    assert not got[3].cc_no_store and not got[3].cc_no_cache


def test_s_maxage_precedence(spark):
    got = _run(spark, ["s-maxage=600, max-age=60", "max-age=60"])
    assert got[0].cc_max_age_sec == 600
    assert got[1].cc_max_age_sec == 60


def test_token_boundaries(spark):
    got = _run(
        spark,
        ["no-cachex, stale-while-revalidate=30", 'no-cache="set-cookie"'],
    )
    assert not got[0].cc_no_cache and not got[0].cc_no_store
    assert got[0].cc_max_age_sec is None  # s-w-r must not feed max-age
    assert got[1].cc_no_cache  # qualified form still counts


def test_case_insensitive(spark):
    got = _run(spark, ["Public, MAX-AGE=120", "NO-STORE"])
    assert got[0].cc_max_age_sec == 120
    assert got[1].cc_no_store


def test_revalidation_headers_latest_fetch_wins(spark):
    from datetime import datetime

    from polars_dataset_spark.functions.recrawl import revalidation_headers

    rows = [
        ("u", datetime(2026, 1, 1), 'W/"old"', "day-1"),
        ("u", datetime(2026, 1, 5), 'W/"new"', "day-5"),
        ("v", datetime(2026, 1, 2), None, "day-2"),
        ("w", datetime(2026, 1, 3), None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts timestamp, etag string, last_modified string"
    )
    got = {r.url: r for r in revalidation_headers(df).collect()}
    assert got["u"].if_none_match == 'W/"new"'
    assert got["u"].if_modified_since == "day-5"
    assert got["u"].revalidatable
    assert got["v"].if_none_match is None and got["v"].revalidatable
    assert got["w"].revalidatable is False


def test_revalidation_validators_same_response(spark):
    # etag from one fetch must never pair with last-modified from another
    from datetime import datetime

    from polars_dataset_spark.functions.recrawl import revalidation_headers

    rows = [
        ("u", datetime(2026, 1, 1), 'W/"a"', None),
        ("u", datetime(2026, 1, 2), None, "day-2"),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts timestamp, etag string, last_modified string"
    )
    (r,) = revalidation_headers(df).collect()
    assert r.if_none_match is None and r.if_modified_since == "day-2"
