"""Domain prior (functions/domains.domain_quality_profile): subdomain
rollup onto the registered domain, signal math, the volume-aware keep
rule, and the unattributable-URL NULL bucket."""

from pyspark.sql import functions as F

from polars_dataset_spark.functions.domains import domain_quality_profile


def _profile(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = domain_quality_profile(df, **kw)
    return {r["domain"]: r for r in out.collect()}


GOOD = "This is a perfectly reasonable prose paragraph with enough words to score well on every heuristic rule."


def test_subdomains_roll_up_to_registered_domain(spark):
    rows = [
        (1, "http://www.good.example/a", GOOD),
        (2, "http://a.good.example/b", GOOD + " More distinct prose here."),
        (3, "http://good.example/c", GOOD + " Another distinct body text."),
    ]
    prof = _profile(spark, rows)
    assert set(prof) == {"good.example"}
    r = prof["good.example"]
    assert r["n_docs"] == 3 and r["dup_rate"] == 0.0 and r["pii_rate"] == 0.0
    assert r["keep"] is True


def test_mirror_host_dup_rate_and_drop(spark):
    boiler = "identical boilerplate body"
    rows = [(i, f"http://m{i % 2}.mirror.example/p{i}", boiler) for i in range(6)]
    prof = _profile(spark, rows, min_quality=0.0)
    r = prof["mirror.example"]
    assert r["n_docs"] == 6
    assert abs(r["dup_rate"] - (1 - 1 / 6)) < 1e-6
    assert r["keep"] is False  # dup_rate > max_dup_rate


def test_pii_rate_and_threshold(spark):
    rows = [
        (i, "http://leaky.example/p%d" % i,
         GOOD + (" mail me at bob@leak.example" if i < 3 else ""))
        for i in range(4)
    ]
    prof = _profile(spark, rows, max_pii_rate=0.5)
    r = prof["leaky.example"]
    assert r["pii_rate"] == 0.75 and r["keep"] is False


def test_min_docs_support_rule(spark):
    # below min_docs there is no basis to ban a host: keep regardless
    rows = [(1, "http://tiny.example/only", "x@y.example ...")]
    prof = _profile(spark, rows, min_docs=3, max_pii_rate=0.0)
    assert prof["tiny.example"]["keep"] is True


def test_unparseable_urls_bucket_under_null(spark):
    rows = [
        (1, "not a url", GOOD),
        (2, "http://ok.example/a", GOOD),
    ]
    prof = _profile(spark, rows)
    assert None in prof and prof[None]["n_docs"] == 1
    assert prof["ok.example"]["n_docs"] == 1


def test_approx_distinct_path_runs(spark):
    rows = [(i, f"http://h.example/{i}", GOOD + str(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = domain_quality_profile(df, exact_distinct=False).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 5


def test_apply_domain_prior_broadcast_drop(spark):
    from polars_dataset_spark.functions.domains import apply_domain_prior

    rows = (
        [(i, f"http://m{i % 2}.bad.example/p{i}", "identical junk body")
         for i in range(6)]
        + [(10 + i, f"http://ok.example/p{i}", GOOD + str(i)) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    profile = domain_quality_profile(df, min_quality=0.0)
    kept = apply_domain_prior(df, profile)
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [10, 11, 12, 13]  # every bad.example doc dropped
    # the drop is a BROADCAST join: corpus side must not shuffle
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_apply_domain_prior_keep_unknown(spark):
    from polars_dataset_spark.functions.domains import apply_domain_prior

    docs = spark.createDataFrame(
        [(1, "http://known.example/a", GOOD),
         (2, "http://stranger.example/b", GOOD)],
        "doc_id long, url string, text string",
    )
    profile = domain_quality_profile(
        docs.filter("doc_id = 1"), min_docs=1, min_quality=0.99
    )  # known.example banned by the impossible quality bar
    kept = apply_domain_prior(docs, profile, keep_unknown=True)
    assert [r.doc_id for r in kept.collect()] == [2]
    none_kept = apply_domain_prior(docs, profile, keep_unknown=False)
    assert none_kept.count() == 0
