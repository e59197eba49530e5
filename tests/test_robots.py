"""robots.txt parsing + frontier filter (functions/robots, r11 —
RFC 9309): group selection, longest-match precedence, wildcard/$
patterns, crawl-delay, the allow-by-default rules, and the zero-
exchange Spark plan."""

import pytest

from polars_dataset_spark.functions.robots import (
    frontier_filter,
    parse_robots,
    pattern_to_regex,
    robots_rules,
)

ROBOTS = """\
# politeness for everyone
User-agent: *
Disallow: /private/
Allow: /private/public/
Disallow: /*.json$
Crawl-delay: 2

User-agent: graftbot
User-agent: otherbot
Disallow: /graft/
Allow: /gr
Crawl-delay: 5
"""


def test_group_selection_most_specific_wins():
    g = parse_robots(ROBOTS, "GraftBot/1.2 (+http://x)")
    assert g["matched_ua"] == "graftbot"
    assert g["rules"] == [("/graft/", False), ("/gr", True)]
    assert g["crawl_delay"] == 5.0
    star = parse_robots(ROBOTS, "unknownbot")
    assert star["matched_ua"] == "*"
    assert star["crawl_delay"] == 2.0
    assert ("/private/", False) in star["rules"]


def test_multiple_user_agent_lines_share_one_group():
    assert parse_robots(ROBOTS, "otherbot")["rules"] == [
        ("/graft/", False),
        ("/gr", True),
    ]


def test_no_matching_group_allows_everything():
    text = "User-agent: onlybot\nDisallow: /\n"
    g = parse_robots(text, "someone-else")
    assert g["rules"] == [] and g["matched_ua"] is None


def test_empty_disallow_is_allow_all():
    g = parse_robots("User-agent: *\nDisallow:\n", "bot")
    assert g["rules"] == []


def test_user_agent_after_rules_starts_new_group():
    text = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert parse_robots(text, "b")["rules"] == [("/y", False)]
    assert parse_robots(text, "a")["rules"] == [("/x", False)]


def test_pattern_to_regex_wildcard_and_anchor():
    import re

    rx = pattern_to_regex("/*.json$")
    assert re.search(rx, "/a/b.json") and not re.search(rx, "/a/b.jsonx")
    rx2 = pattern_to_regex("/p")
    assert re.search(rx2, "/private") and not re.search(rx2, "/x/p")
    # regex metachars in paths are escaped literals
    rx3 = pattern_to_regex("/a+b(c)")
    assert re.search(rx3, "/a+b(c)/d") and not re.search(rx3, "/aab(c)")


def _apply(rules, path):
    """Longest-match precedence over parsed (pattern, allow) rules —
    the python-side reference for the Spark expression."""
    import re

    best = None
    for pattern, allow in rules:
        if re.search(pattern_to_regex(pattern), path):
            key = (len(pattern), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def test_longest_match_and_allow_tie():
    star = parse_robots(ROBOTS, "nobody")["rules"]
    assert _apply(star, "/private/x") is False
    assert _apply(star, "/private/public/x") is True  # longer allow wins
    assert _apply(star, "/data/feed.json") is False  # wildcard + $
    assert _apply(star, "/data/feed.jsonl") is True  # $ anchor holds
    assert _apply(star, "/open/page") is True
    # exact tie, allow wins: /dir disallow vs /dir allow
    tie = [("/dir", False), ("/dir", True)]
    assert _apply(tie, "/dir/x") is True


@pytest.fixture(scope="module")
def rule_frames(spark):
    robots_df = spark.createDataFrame(
        [
            ("a.example", bytearray(ROBOTS.encode())),
            ("b.example", bytearray(b"User-agent: *\nDisallow:\nCrawl-delay: 1\n")),
        ],
        "host string, robots_txt binary",
    )
    return robots_rules(robots_df, user_agent="graftbot")


def test_robots_rules_frame(rule_frames):
    rows = {(r.host, r.rule_rx): r for r in rule_frames.collect()}
    assert (("a.example", pattern_to_regex("/graft/")) in rows)
    a_row = rows[("a.example", pattern_to_regex("/gr"))]
    assert a_row.allow is True and a_row.rule_len == 3 and a_row.crawl_delay == 5.0
    # rule-less host still carries its crawl_delay via the marker row
    marker = rows[("b.example", None)]
    assert marker.crawl_delay == 1.0 and marker.allow is None


def test_frontier_filter_end_to_end(spark, rule_frames):
    links = spark.createDataFrame(
        [
            (0, "http://a.example/graft/secret"),
            (1, "http://a.example/gr/ok"),
            (2, "http://a.example/private/x"),  # graftbot group: no rule
            (3, "http://b.example/anything"),
            (4, "http://norobots.example/x"),
            (5, "http://a.example"),  # no path -> '/'
        ],
        "link_id long, url_canon string",
    )
    out = {
        r.link_id: r
        for r in frontier_filter(links, rule_frames, keep_disallowed=True).collect()
    }
    assert out[0].allowed is False and out[0].crawl_delay == 5.0
    assert out[1].allowed is True
    assert out[2].allowed is True  # selected group has no /private rule
    assert out[3].allowed is True and out[3].crawl_delay == 1.0
    assert out[4].allowed is True and out[4].crawl_delay is None
    assert out[5].allowed is True
    kept = {r.link_id for r in frontier_filter(links, rule_frames).collect()}
    assert kept == {1, 2, 3, 4, 5}


def test_frontier_plan_is_broadcast_only(spark, rule_frames):
    links = spark.createDataFrame(
        [(0, "http://a.example/x")], "link_id long, url_canon string"
    )
    plan = (
        frontier_filter(links, rule_frames)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_schedule_frontier_per_host_queues(spark):
    from polars_dataset_spark.functions.robots import schedule_frontier

    links = spark.createDataFrame(
        [
            (0, "http://a.example/z", 5.0),
            (1, "http://a.example/a", 5.0),
            (2, "http://b.example/x", None),
            (3, "http://b.example/y", None),
        ],
        "link_id long, url_canon string, crawl_delay double",
    )
    got = {r.link_id: r for r in schedule_frontier(links).collect()}
    # per-host queue in url order; offsets spaced by the host's delay
    assert (got[1].fetch_seq, got[0].fetch_seq) == (0, 1)
    assert got[0].fetch_offset_sec == 5.0 and got[1].fetch_offset_sec == 0.0
    # no-robots host falls back to the default 1.0 s spacing
    assert (got[2].fetch_seq, got[3].fetch_seq) == (0, 1)
    assert got[3].fetch_offset_sec == 1.0


def test_hostile_inputs_never_raise():
    for text in ("", "\x00\xff", "User-agent:", "Disallow: /x", ":::\n#", "A" * 10000):
        parse_robots(text, "bot")
