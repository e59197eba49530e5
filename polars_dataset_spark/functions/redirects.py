"""HTTP redirect-chain resolution — the crawl graph's alias edges.

A real crawl is full of 3xx responses: ``http://…`` → ``https://…``,
apex → ``www``, moved pages, shorteners. Until the chain is resolved,
frontier dedup and per-URL stats double-count every alias, and content
fetched at the chain's end is attributed to the wrong key. Resolution
is a pure graph problem: the 3xx records define ``src → dst`` edges
(the ``Location`` header, RFC 9110 §10.2.2, resolved against the
record's own URI since ``Location`` may be relative), and each source
must be mapped to the TERMINAL url its chain reaches — or flagged as a
loop (``http→https→http`` misconfigurations are common in the wild).

Scale shape (the part that matters at 100 TB): redirect maps at crawl
scale are billions of edges — far too big to broadcast, and chains must
not be walked one hop per job. :func:`resolve_redirects` uses POINTER
JUMPING (path doubling): each round joins the partial map to itself so
the known distance doubles — ``log2(max_hops)`` hash-join rounds total,
each a single shuffle on the url key, instead of ``max_hops``
sequential joins. Chains longer than ``max_hops`` and cycles come out
with ``resolved = false`` and a null final url (gate, not guess).

:func:`resolve_location_col` is deliberately a pure codegen expression
(no UDF): absolute, protocol-relative (``//host/p``), absolute-path
(``/p``) and relative-path forms, each replayable step-for-step in an
ANSI-SQL oracle. Dot-segment normalisation (``../``) is documented out
of scope — vanishingly rare in Location headers, and a crawler that
needs it can canonicalize afterwards.

Reference envelope: `/root/reference/polars_dataset.py` has no crawl
surface; this is the driver-mandated pipeline extension family
(SURVEY §2.4) composing with sources/warc.py (which surfaces
``http_status`` / ``http_location``) and functions/urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "REDIRECT_STATUSES",
    "resolve_location_col",
    "extract_redirect_edges",
    "extract_meta_refresh_edges",
    "resolve_redirects",
]

REDIRECT_STATUSES = [301, 302, 303, 307, 308]

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
# scheme://authority (userinfo kept — it is part of the origin prefix we
# re-attach path-form Locations to; crawl URLs essentially never carry it)
_ORIGIN_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
# everything from origin up to and including the LAST '/' of the path —
# the RFC 3986 §5.3 merge base for relative references
_DIR_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(?:/[^?#]*/)?)"


def resolve_location_col(base: Column, loc: Column) -> Column:
    """Resolve a ``Location`` header value against the redirecting
    record's own URI — pure codegen, every branch SQL-replayable:

    - absolute (``scheme://…``) → taken as-is;
    - protocol-relative (``//host/p``) → base's scheme + ``:`` + loc;
    - absolute-path (``/p``) → base's origin + loc;
    - relative path → base's directory (origin + path up to the last
      ``/``, ``/`` when the path is empty) + loc;
    - null/empty loc, or a path-form loc whose base has no parseable
      origin → null.

    No dot-segment normalisation (see module docstring)."""
    scheme = F.regexp_extract(base, _SCHEME_RE, 1)
    origin = F.regexp_extract(base, _ORIGIN_RE, 1)
    basedir = F.regexp_extract(base, _DIR_RE, 1)
    basedir = F.when(basedir == origin, F.concat(origin, F.lit("/"))).otherwise(
        basedir
    )
    out = (
        F.when(loc.isNull() | (loc == ""), F.lit(None))
        .when(loc.rlike(_SCHEME_RE), loc)
        .when(
            loc.startswith("//"),
            F.when(scheme == "", F.lit(None)).otherwise(
                F.concat(scheme, F.lit(":"), loc)
            ),
        )
        .when(
            loc.startswith("/"),
            F.when(origin == "", F.lit(None)).otherwise(F.concat(origin, loc)),
        )
        .otherwise(
            F.when(origin == "", F.lit(None)).otherwise(F.concat(basedir, loc))
        )
    )
    return out


def extract_redirect_edges(
    df: DataFrame,
    uri_col: str = "target_uri",
    status_col: str = "http_status",
    location_col: str = "http_location",
) -> DataFrame:
    """3xx records → ``(src, dst)`` alias edges: filter on the redirect
    statuses, resolve ``Location`` against the record's own URI, drop
    rows whose Location cannot be resolved and exact self-loops
    (``src == dst`` — a self-redirect is already terminal-or-loop and
    would poison the map). Map-only: one filter + one projection on the
    scan, zero exchanges."""
    edges = (
        df.filter(F.col(status_col).isin(REDIRECT_STATUSES))
        .select(
            F.col(uri_col).alias("src"),
            resolve_location_col(F.col(uri_col), F.col(location_col)).alias(
                "dst"
            ),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    )
    return edges


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 8,
) -> DataFrame:
    """Map every redirect source to its chain's terminal url by pointer
    jumping: ``(src, final_url, hops, resolved)``.

    The edge set is first collapsed to a FUNCTION (one ``dst`` per
    ``src`` — ``max`` tie-break, deterministic at any partitioning;
    callers with fetch timestamps should pre-pick the freshest edge
    instead). Then ``log2(max_hops)`` doubling rounds: round ``k``
    joins the partial map (``src → node reached after ≤ 2^k hops,
    stopping early at a terminal``) to itself on the reached node —
    each round ONE hash-join shuffle on the url key, never a
    driver-side walk, never one-job-per-hop. A chain of length L
    resolves in ``ceil(log2(L))`` rounds; cycles and chains longer
    than ``max_hops`` never leave the source domain and come out
    ``resolved = false`` with null ``final_url``/``hops``.

    ``max_hops`` must be a power of two (it is the exact reach of the
    doubling schedule, and the SQL-oracle replay bounds its recursion
    at the same number)."""
    if max_hops < 2 or max_hops & (max_hops - 1):
        raise ValueError("max_hops must be a power of two >= 2")
    from polars_dataset_spark.session import ensure_parallelism, pin

    edges = ensure_parallelism(edges)
    # PIN the collapsed map: `m` is referenced by BOTH sides of every
    # doubling round plus the terminal anti-semijoin — without a lineage
    # cut Catalyst re-derives it (and the whole edge-extraction pipeline
    # below it, which for WARC-sourced edges is an applyInPandas write +
    # mapInPandas parse) once PER REFERENCE: the q238 plan carried 18
    # copies of the archive write/parse stages. Non-eager localCheckpoint
    # materializes it once at first use — the connected_components /
    # pagerank precedent, same fault-tolerance tradeoff (blocks pinned on
    # executors, lineage truncated).
    m = pin(
        edges.groupBy(F.col(src_col).alias("src")).agg(F.max(dst_col).alias("dst"))
    )
    # the partial map: src -> (cur, steps); cur is the node reached
    # after `steps` hops, early-stopped at terminals (nodes that are
    # not themselves redirect sources simply never match the join)
    j = m.select("src", F.col("dst").alias("cur"), F.lit(1).alias("steps"))
    rounds = max_hops.bit_length() - 1  # log2 of a power of two
    for rnd in range(rounds):
        b = j.select(
            F.col("src").alias("b_src"),
            F.col("cur").alias("b_cur"),
            F.col("steps").alias("b_steps"),
        )
        j = (
            j.join(b, j["cur"] == b["b_src"], "left")
            .select(
                "src",
                F.coalesce("b_cur", "cur").alias("cur"),
                F.when(
                    F.col("b_cur").isNotNull(),
                    F.col("steps") + F.col("b_steps"),
                )
                .otherwise(F.col("steps"))
                .alias("steps"),
            )
        )
        # each round references the previous `j` TWICE (probe + build
        # side of the self-join): without a per-round cut the plan
        # doubles per round — 2^rounds subtrees — exactly the disease
        # connected_components checkpoints away. One cut per round keeps
        # the plan flat and every round's work computed once. The FINAL
        # round is exempt: its result feeds only the terminal join
        # (single reference), so a cut there would be a pure extra
        # materialization pass.
        if rnd < rounds - 1:
            j = pin(j)
    # terminal iff the reached node is not itself a redirect source
    srcs = m.select(F.col("src").alias("t_src"))
    out = (
        j.join(srcs, j["cur"] == srcs["t_src"], "left")
        .select(
            "src",
            F.when(F.col("t_src").isNull(), F.col("cur")).alias("final_url"),
            F.when(F.col("t_src").isNull(), F.col("steps"))
            .cast("bigint")
            .alias("hops"),
            F.col("t_src").isNull().alias("resolved"),
        )
    )
    return out


#: meta-refresh extraction (the HTML-level redirect 3xx headers can't
#: see): content="<secs>;url=<target>" with either attribute order.
META_REFRESH_NAME_FIRST_RE = (
    r"(?i)<meta[^>]{0,256}?http-equiv\s*=\s*[\"']?refresh[\"']?"
    r"[^>]{0,512}?content\s*=\s*[\"']\s*[0-9]+\s*;\s*url\s*=\s*([^\"'>]+)"
)
META_REFRESH_CONTENT_FIRST_RE = (
    r"(?i)<meta[^>]{0,256}?content\s*=\s*[\"']\s*[0-9]+\s*;\s*url\s*="
    r"\s*([^\"'>]+)[\"'][^>]{0,256}?http-equiv\s*=\s*[\"']?refresh"
)


def extract_meta_refresh_edges(
    df: DataFrame,
    uri_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """HTML meta-refresh redirects → ``(src, dst)`` alias edges — the
    soft-redirect layer 3xx extraction can't see (parked pages,
    legacy CMSes, splash screens); real crawls resolve BOTH sources
    into one alias map (union with :func:`extract_redirect_edges`
    then :func:`resolve_redirects`). Either attribute order; the
    target resolves against the page's own URI with the same
    :func:`resolve_location_col` branches; pages without a refresh
    and self-loops drop. Map-only, zero exchanges."""
    h = F.col(html_col)
    target = F.coalesce(
        F.nullif(F.regexp_extract(h, META_REFRESH_NAME_FIRST_RE, 1), F.lit("")),
        F.nullif(
            F.regexp_extract(h, META_REFRESH_CONTENT_FIRST_RE, 1), F.lit("")
        ),
    )
    staged = df.withColumn("__refresh_target", F.trim(target))
    edges = (
        staged.filter(F.col("__refresh_target").isNotNull())
        .select(
            F.col(uri_col).alias("src"),
            resolve_location_col(
                F.col(uri_col), F.col("__refresh_target")
            ).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    )
    return edges
