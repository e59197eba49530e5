"""Common Crawl / web-archive CDX index handling: SURT keys and the
CDX-J line format — what a crawl-archive pipeline reads FIRST (you
select records from the petabyte archive's INDEX, then fetch only the
matching WARC byte ranges; grepping the WARCs themselves is the
canonical scale mistake).

Two pieces, both pure codegen'd Column expressions (no UDF, map-only,
the identical steps replayable in an ANSI-SQL oracle):

- :func:`surt_col` — the Sort-friendly URI Reordering Transform key
  (simplified pywb-flavoured form, documented below): lowercase, host
  labels REVERSED and comma-joined so one domain's records are one
  contiguous key range (``com,example)/path``), default ports and
  fragments dropped, query kept as-is. Deviations from full SURT
  canonicalization are documented, not hidden: no %-encoding
  normalization, no session-param stripping (compose
  ``canonicalize_url`` upstream for that), ``www`` is KEPT (strict
  SURT; pywb's fuzzy match drops it at LOOKUP time, not in the key).
- :func:`cdxj_lines` / :func:`read_cdxj` — parse the CDX-J line
  format ``<surt> <timestamp14> <json-payload>`` (the modern CC/pywb
  index shape): two token splits + ``from_json`` for the payload
  (url, mime, status, digest, length, offset, filename), all JVM-side.
  Malformed lines yield null payload fields, never a dead task.

At 100 TB: the index is ~1/1000 the archive's bytes and sorted by
SURT, so partition pruning on the key range + a filename/offset
projection is the whole "which bytes do I fetch" job — zero shuffles.

Reference envelope: `/root/reference/polars_dataset.py` has no web
surface; this extends the crawl-pipeline family (q206/q215/q218).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "surt_col",
    "with_surt",
    "cdxj_lines",
    "cdxj_line_col",
    "read_cdxj",
    "CDXJ_PAYLOAD_SCHEMA",
]

from polars_dataset_spark.functions.urls import _HOST_RE, _PATH_RE, _PORT_RE, _QUERY_RE, _SCHEME_RE


def surt_col(url: Column) -> Column:
    """SURT key of a URL column (simplified pywb-flavoured form — see
    module docstring for the documented deviations). Unparseable URLs
    (no scheme/host) yield NULL."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    port = F.regexp_extract(url, _PORT_RE, 1)
    path_raw = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(F.lower(path_raw))
    query = F.regexp_extract(url, _QUERY_RE, 1)
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    nondefault = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    key = F.concat(
        rev_host,
        F.when(nondefault, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), F.lower(query))).otherwise(F.lit("")),
    )
    return F.when((scheme == "") | (host == ""), F.lit(None)).otherwise(key)


def with_surt(df: DataFrame, url_col: str = "url", out_col: str = "surt") -> DataFrame:
    """Append the SURT key column — pure projection, zero exchanges."""
    return df.withColumn(out_col, surt_col(F.col(url_col)))


CDXJ_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.StringType()),
        T.StructField("offset", T.StringType()),
        T.StructField("filename", T.StringType()),
    ]
)
# CC's CDX-J stores numerics as JSON STRINGS ("length": "2526") — the
# schema mirrors that and the typed view casts, so a numeric-typed
# schema can never silently null out every row.


def cdxj_lines(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse CDX-J lines from a string column: ``surt``, ``ts``
    (14-digit capture timestamp as string — cast downstream if you
    need ordering beyond lexicographic, which the format guarantees),
    the payload fields, and typed ``warc_length``/``warc_offset``
    columns. Lines whose shape doesn't match yield nulls. One
    projection — compose after ``spark.read.text`` (splittable) or on
    any in-flight column."""
    line = F.col(line_col)
    surt = F.regexp_extract(line, r"^(\S+) \d{14} \{", 1)
    ts = F.regexp_extract(line, r"^\S+ (\d{14}) \{", 1)
    payload = F.expr(
        f"from_json(regexp_extract({line_col}, '^\\\\S+ \\\\d{{14}} (.*)$', 1),"
        " 'url string, mime string, status string, digest string,"
        " length string, offset string, filename string')"
    )
    out = df.select(
        *[c for c in df.columns if c != line_col],
        F.when(surt == "", F.lit(None)).otherwise(surt).alias("surt"),
        F.when(ts == "", F.lit(None)).otherwise(ts).alias("ts"),
        payload.alias("__p"),
    )
    return out.select(
        *[c for c in out.columns if c != "__p"],
        F.col("__p.url").alias("url"),
        F.col("__p.mime").alias("mime"),
        F.col("__p.status").cast("int").alias("http_status"),
        F.col("__p.digest").alias("digest"),
        F.col("__p.length").cast("long").alias("warc_length"),
        F.col("__p.offset").cast("long").alias("warc_offset"),
        F.col("__p.filename").alias("warc_filename"),
    )


def cdxj_line_col(
    url: Column,
    ts: Column,
    mime: Column,
    status: Column,
    digest: Column,
    length: Column,
    offset: Column,
    filename: Column,
) -> Column:
    """The WRITE side of :func:`cdxj_lines` — one CDX-J index line
    ``<surt> <ts14> <json>`` from record columns, the exact inverse the
    round-trip needs (q231): ``cdxj_lines(cdxj_line_col(...))`` hands
    back the same fields. Numerics are stringified in the JSON payload
    (the CC convention the parse side's schema mirrors). Pure codegen:
    :func:`surt_col` + ``to_json(struct(...))`` — map-only, and the
    output sorts into the SURT key order the archive's index requires.
    Rows whose URL has no SURT key (unparseable) yield NULL — an index
    must not contain unkeyed lines."""
    payload = F.to_json(
        F.struct(
            url.alias("url"),
            mime.alias("mime"),
            status.cast("string").alias("status"),
            digest.alias("digest"),
            length.cast("string").alias("length"),
            offset.cast("string").alias("offset"),
            filename.alias("filename"),
        )
    )
    key = surt_col(url)
    return F.when(
        key.isNotNull(), F.concat_ws(" ", key, ts, payload)
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Read CDX-J index files (plain or .gz by extension) into parsed
    records — ``spark.read.text`` (newline-splittable) + one
    :func:`cdxj_lines` projection. Filter on ``surt`` prefixes /
    ``mime`` / ``http_status`` and project ``warc_filename`` +
    ``warc_offset``/``warc_length`` to plan the fetch — the index job
    that replaces scanning the archive."""
    return cdxj_lines(spark.read.text(path), line_col="value")
