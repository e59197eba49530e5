"""URL parsing and domain-level filtering — the provenance axis of a
web-scale corpus.

Every large pretraining pipeline filters and caps BY DOMAIN (blocklists,
per-domain quotas, provenance stats); that needs structured URL parts,
not raw strings. Everything here is pure codegen'd expressions
(RE2/Java-portable regexes — no lookaround, no backreferences — so the
identical patterns run in Spark AND an ANSI-SQL oracle), map-only over
the scan:

- :func:`with_url_parts` — scheme/host/port/path/query + path-segment
  and query-param counts;
- :func:`registered_domain_col` — the "one level below the public
  suffix" domain with an embedded multi-part-suffix subset (co.uk &
  friends). The full Public Suffix List is thousands of rules; the
  embedded subset covers the common two-label suffixes and the
  heuristic (last two labels otherwise) is EXPLICITLY documented as
  such — swap in the full PSL as a broadcast table if exactness
  matters for long-tail ccTLDs;
- :func:`filter_url_blocklist` — broadcast anti-join on the registered
  domain (blocklists are small; the corpus side never shuffles).

At 100 TB: all three are map-only (the blocklist join broadcasts), so
URL filtering adds zero exchanges to a scan→filter→write pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MULTIPART_SUFFIXES",
    "TRACKING_PARAM_RE",
    "canonical_url_col",
    "canonicalize_url",
    "with_url_parts",
    "registered_domain_col",
    "filter_url_blocklist",
]

# Common second-level public suffixes (subset of the public PSL): hosts
# ending in one of these keep THREE labels in the registered domain.
MULTIPART_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
]

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
# Anchored so only a '?' BEFORE any '#' starts the query — an
# unanchored \? would match a '?' inside the fragment
# (http://h/p#a?b must have no query, not query "b").
_QUERY_RE = r"^[^#]*?\?([^#]*)"


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``scheme, host, port, path, query, n_path_segments,
    n_query_params, domain`` parsed from ``url_col``. Unparseable rows
    get null scheme/host/domain and zero counts. Map-only.

    Two projections on purpose: the five regexp extractions land first,
    and the derived columns (counts, registered domain) reference them
    as ALIASES — ``domain`` mentions ``host`` eight times, and the
    single-projection form inlined the host regexp at every mention
    (9 copies, tools/expr_dup_audit.py); CollapseProject keeps the
    stages apart because merging would duplicate non-cheap aliases."""
    u = F.col(url_col)
    staged = df.withColumns(
        {
            "scheme": F.nullif(F.lower(F.regexp_extract(u, _SCHEME_RE, 1)), F.lit("")),
            "host": F.nullif(F.lower(F.regexp_extract(u, _HOST_RE, 1)), F.lit("")),
            "port": F.nullif(F.regexp_extract(u, _PORT_RE, 1), F.lit("")).cast("int"),
            "path": F.nullif(F.regexp_extract(u, _PATH_RE, 1), F.lit("")),
            "query": F.nullif(F.regexp_extract(u, _QUERY_RE, 1), F.lit("")),
        }
    )
    host, path, query = F.col("host"), F.col("path"), F.col("query")
    n_seg = F.when(path.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    )
    n_par = F.when(query.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(F.split(query, "&"), lambda s: s != ""))
    )
    return staged.withColumns(
        {
            "n_path_segments": n_seg.cast("int"),
            "n_query_params": n_par.cast("int"),
            "domain": registered_domain_col(host),
        }
    )


def registered_domain_col(host: Column) -> Column:
    """Registered domain of a host column: last two labels, or last
    THREE when the host ends in an embedded multi-part public suffix
    (``a.b.co.uk`` → ``b.co.uk``). IP-literal hosts pass through
    unchanged. Heuristic by design — see the module docstring."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    is_ip = host.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    multi = last2.isin(MULTIPART_SUFFIXES)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(is_ip | (n <= 2), host)
        .when(multi & (n >= 3), last3)
        .otherwise(last2)
    )


def filter_url_blocklist(
    df: DataFrame,
    blocked_domains: "DataFrame | list[str]",
    url_col: str = "url",
    keep_unparseable: bool = False,
) -> DataFrame:
    """Drop rows whose REGISTERED DOMAIN is blocklisted (so
    ``evil.spam.example`` is caught by blocking ``spam.example`` — the
    reason the join key is the registered domain, not the host).
    ``blocked_domains`` is a single-column DataFrame or a plain list;
    either way it is broadcast — the corpus side never shuffles.
    Unparseable URLs (null domain) drop unless ``keep_unparseable``."""
    spark = df.sparkSession
    if isinstance(blocked_domains, list):
        blocked = spark.createDataFrame(
            [(d.lower(),) for d in blocked_domains], "blocked_domain string"
        )
    else:
        blocked = blocked_domains.toDF("blocked_domain")
    has_parts = "domain" in df.columns
    parts = df if has_parts else with_url_parts(df, url_col)
    out = parts.join(
        F.broadcast(blocked),
        parts["domain"] == blocked["blocked_domain"],
        "left_anti",
    )
    if not keep_unparseable:
        out = out.filter(F.col("domain").isNotNull())
    return out if has_parts else out.drop(
        "scheme", "host", "port", "path", "query",
        "n_path_segments", "n_query_params", "domain",
    )


# Query parameters that carry click/campaign tracking, not content
# identity — the canonical dedup-prep drop set (utm_* per Google
# Analytics docs; fbclid/gclid/msclkid per the platforms' public docs)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid)(=.*)?$"

_FRAGMENT_RE = r"#.*$"
_QUERY_RE2 = _QUERY_RE  # same fragment-safe anchoring as the parts regex


def canonical_url_col(url: Column) -> Column:
    """The canonical form of ``url`` as a pure codegen'd expression —
    no UDF, and every step has an exact ANSI-SQL twin (the q207 oracle
    replays it value-for-value in DuckDB):

    1. scheme + host lowercased;
    2. default ports stripped (http:80, https:443) — others kept;
    3. fragment dropped (never sent to the server);
    4. query params: empties and tracking params
       (:data:`TRACKING_PARAM_RE`) dropped, the rest BYTE-SORTED and
       re-joined — ``?b=2&a=1`` and ``?a=1&b=2`` are the same resource;
    5. path: runs of slashes collapsed, empty path becomes ``/``;
    6. null when scheme or host is missing (not a fetchable URL).

    URL-level dedup is the cheapest dedup a crawl pipeline has — it
    runs BEFORE fetch/content dedup, on strings alone, map-only.
    Deliberately NOT done (each loses information some pipelines need):
    percent-decoding (changes equivalence class under encoded
    delimiters), www-stripping and trailing-slash removal (different
    resources on some origins)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    port = F.regexp_extract(url, _PORT_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE2, 1)
    keep_port = (port != F.lit("")) & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    pathc = F.regexp_replace(path, "/{2,}", "/")
    pathc = F.when(pathc == "", F.lit("/")).otherwise(pathc)
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        pathc,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )
    return F.when((scheme == "") | (host == ""), F.lit(None)).otherwise(out)


def canonicalize_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url_canon"
) -> DataFrame:
    """Attach the canonical URL (see :func:`canonical_url_col`) —
    map-only, zero exchanges, whole-stage codegen."""
    return df.withColumn(out_col, canonical_url_col(F.col(url_col)))
