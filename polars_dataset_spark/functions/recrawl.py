"""Recrawl scheduling — estimating per-URL change rates from fetch
history.

A crawler that refetches everything at the same cadence wastes most of
its budget: news frontpages change hourly, documentation pages change
yearly. The classic fix (Cho & Garcia-Molina, "Estimating Frequency of
Change", ACM TOIT 2003) models each page as a Poisson change process
and estimates its rate from the observed fetch history — exactly the
data the archive already holds: (url, fetch timestamp, payload digest)
per fetch, where ``digest != previous digest`` marks an observed
change. The estimator used here is the paper's bias-corrected
frequency estimator

    r_hat = -ln((n - X + 0.5) / (n + 0.5))

with ``n`` = number of fetch intervals and ``X`` = intervals that
showed a change — consistent even though a fast-changing page can
change several times inside one interval (naive X/n saturates at 1;
r_hat keeps growing).

:func:`estimate_change_rate` is one window + one aggregate, both keyed
on the url — Catalyst reuses the window's hash partitioning for the
aggregate, so the whole operator costs ONE shuffle at any scale, and
the output is one row per url (frontier-sized, broadcastable into the
scheduler). Composes with sources/warc.py (``mark_revisits`` digests,
CDX ``ts``/``digest`` fields are exactly this history).

Reference envelope: `/root/reference/polars_dataset.py` has no crawl
surface; driver-mandated pipeline extension family (SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["estimate_change_rate", "with_cache_hints", "revalidation_headers"]

#: next-fetch bounds (days): never refetch faster than daily off
#: history alone, never let a URL go unvisited for more than a year.
MIN_NEXT_DAYS = 1.0
MAX_NEXT_DAYS = 365.0


def estimate_change_rate(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-URL change-rate estimate and next-fetch schedule from a
    fetch history ``(url, ts, digest)``:

    - ``n_fetches`` / ``n_changes`` — fetches, and fetch intervals
      whose digest differs from the previous fetch's;
    - ``avg_interval_days`` — mean observed fetch spacing (null with a
      single fetch);
    - ``change_per_interval`` — the Cho–Garcia-Molina r_hat (null with
      a single fetch: zero intervals is zero evidence);
    - ``next_fetch_days`` — ``avg_interval_days / r_hat`` (the spacing
      at which ~one change per visit is expected), clamped to
      [``MIN_NEXT_DAYS``, ``MAX_NEXT_DAYS``]; never-changing or
      single-fetch URLs get the max (revisit eventually, cheaply);
    - ``bucket`` — operator tier for the scheduler: ``daily`` (≤2 d),
      ``weekly`` (≤10 d), ``monthly`` (≤45 d), else ``quarterly``.

    Floats round to 6 (the suite's per-row arithmetic contract)."""
    from polars_dataset_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    w = Window.partitionBy("url").orderBy("ts")
    lagged = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
    ).withColumn("prev_digest", F.lag("digest").over(w))
    agg = lagged.groupBy("url").agg(
        F.count("*").alias("n_fetches"),
        F.sum(
            F.when(
                F.col("prev_digest").isNotNull()
                & (F.col("digest") != F.col("prev_digest")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        (
            (
                # cast: TIMESTAMP_NTZ parquet columns (UTC session)
                F.unix_timestamp(F.max("ts").cast("timestamp"))
                - F.unix_timestamp(F.min("ts").cast("timestamp"))
            ).cast("double")
            / 86400.0
        ).alias("span_days"),
    )
    n_ivl = F.col("n_fetches") - F.lit(1)
    ivl = F.when(
        n_ivl > 0, F.col("span_days") / n_ivl.cast("double")
    )
    # ln((n+.5)/(n-X+.5)) == -ln((n-X+.5)/(n+.5)) but never emits -0.0
    # (the q139 negative-zero hash lesson); the oracle uses the same form
    rhat = F.when(
        n_ivl > 0,
        F.log(
            (n_ivl + F.lit(0.5))
            / (n_ivl - F.col("n_changes") + F.lit(0.5))
        ),
    )
    nxt = F.when(
        rhat.isNull() | (rhat <= 0) | ivl.isNull(), F.lit(MAX_NEXT_DAYS)
    ).otherwise(
        F.least(F.greatest(ivl / rhat, F.lit(MIN_NEXT_DAYS)), F.lit(MAX_NEXT_DAYS))
    )
    out = agg.select(
        "url",
        F.col("n_fetches").cast("bigint").alias("n_fetches"),
        F.col("n_changes").cast("bigint").alias("n_changes"),
        F.round(ivl, 6).alias("avg_interval_days"),
        F.round(rhat, 6).alias("change_per_interval"),
        F.round(nxt, 6).alias("next_fetch_days"),
    ).withColumn(
        "bucket",
        F.when(F.col("next_fetch_days") <= 2.0, F.lit("daily"))
        .when(F.col("next_fetch_days") <= 10.0, F.lit("weekly"))
        .when(F.col("next_fetch_days") <= 45.0, F.lit("monthly"))
        .otherwise(F.lit("quarterly")),
    )
    return out


#: Cache-Control token patterns (RE2/Java-portable, case-insensitive,
#: token-boundary anchored so "s-maxage" never feeds "max-age")
CC_MAX_AGE_RE = r"(?i)(?:^|[,\s])max-age\s*=\s*([0-9]+)"
CC_S_MAXAGE_RE = r"(?i)(?:^|[,\s])s-maxage\s*=\s*([0-9]+)"
CC_NO_STORE_RE = r"(?i)(?:^|[,\s])no-store(?:$|[,\s])"
CC_NO_CACHE_RE = r"(?i)(?:^|[,\s])no-cache(?:$|[,\s=])"


def with_cache_hints(
    df: DataFrame,
    cache_control_col: str = "cache_control",
    out_prefix: str = "cc_",
) -> DataFrame:
    """Parse the origin's OWN freshness claims out of a
    ``Cache-Control`` header column — the third evidence source for
    the recrawl scheduler beside observed change history
    (:func:`estimate_change_rate`) and sitemap ``changefreq`` hints:

    - ``cc_max_age_sec`` — ``max-age`` seconds, with ``s-maxage``
      taking precedence when present (RFC 9111 §5.2.2.10: the shared-
      cache value is the one a crawler is); null when neither present;
    - ``cc_no_store`` / ``cc_no_cache`` — boolean directives (token-
      boundary matched: ``no-cache=...`` qualifies, ``no-cachex``
      does not).

    Headers lie in both directions (max-age=0 on static pages,
    year-long ages on daily-changing ones), which is exactly why this
    returns EVIDENCE columns for the scheduler to weigh rather than a
    schedule. Pure codegen, map-only, identical pattern strings
    replayable in SQL."""
    cc = F.col(cache_control_col)
    s_age = F.nullif(F.regexp_extract(cc, CC_S_MAXAGE_RE, 1), F.lit(""))
    age = F.nullif(F.regexp_extract(cc, CC_MAX_AGE_RE, 1), F.lit(""))
    return df.withColumns(
        {
            f"{out_prefix}max_age_sec": F.coalesce(s_age, age).cast("bigint"),
            f"{out_prefix}no_store": F.coalesce(
                cc.rlike(CC_NO_STORE_RE), F.lit(False)
            ),
            f"{out_prefix}no_cache": F.coalesce(
                cc.rlike(CC_NO_CACHE_RE), F.lit(False)
            ),
        }
    )


def revalidation_headers(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    etag_col: str = "etag",
    last_modified_col: str = "last_modified",
) -> DataFrame:
    """Conditional-GET bookkeeping (RFC 9110 §13.1): from the fetch
    history, the validators the NEXT fetch should send per url —
    ``if_none_match`` (the latest fetch's ETag) and
    ``if_modified_since`` (its Last-Modified), both from the SAME
    latest response (mixing validators across fetches is how caches
    revalidate the wrong entity), plus ``revalidatable`` (either
    present). A 304 costs headers instead of a body — across a
    billion-URL refetch wave this is most of the bandwidth budget.

    One window (row_number over ts desc per url) — a single hash
    shuffle on the url key; output is frontier-sized. Ties on ts take
    the window's deterministic first row only if the caller's ts is
    unique per url (fetch timestamps are); dedup upstream otherwise."""
    from polars_dataset_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    w = Window.partitionBy("url").orderBy(F.col("ts").desc())
    latest = (
        df.select(
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("ts"),
            F.col(etag_col).alias("etag"),
            F.col(last_modified_col).alias("lm"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return latest.select(
        "url",
        F.col("etag").alias("if_none_match"),
        F.col("lm").alias("if_modified_since"),
        (F.col("etag").isNotNull() | F.col("lm").isNotNull()).alias(
            "revalidatable"
        ),
    )
