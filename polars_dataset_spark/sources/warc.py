"""WARC (Web ARChive, ISO 28500) record ingestion.

Real crawls arrive as WARC files — the Common Crawl distribution format:
a concatenation of records, each a ``WARC/1.x`` header block plus a
``Content-Length``-framed payload, usually stored as per-record gzip
members so readers can split files without decompressing the whole
thing. A training-data pipeline's very first operator is "turn WARC
bytes into (uri, date, http status, payload) rows"; everything else
(language id, quality, dedup) hangs off it.

:func:`warc_records` is that operator: one map-only Arrow pass over a
binary column, each blob exploding into its records. Parsing is pure
stdlib byte arithmetic from the public spec — header block terminated
by CRLFCRLF, payload framed by ``Content-Length``, records separated by
two CRLFs, per-record gzip members handled via ``zlib`` with multi-
member continuation. For ``response`` records the embedded HTTP message
is split too (status code, Content-Type, body) — the body is what the
text pipeline actually wants.

Malformed tails are dropped, not raised: on a 100 TB crawl a truncated
final record per file is normal, and one bad blob must not kill a
partition. The ``n`` records successfully parsed before the corruption
are still emitted.

Reference envelope: `/root/reference/polars_dataset.py` has no
ingestion surface beyond CSV; this is the driver-mandated pipeline
extension family (SURVEY §2.4).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAX_HEADER = 64 << 10  # a WARC/HTTP header block beyond 64 KiB is garbage


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the per-record layout);
    returns as much as decompresses cleanly."""
    out = []
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data[pos:]))
        except zlib.error:
            break
        if not d.eof:  # truncated member
            break
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def _parse_headers(block: bytes) -> "dict[str, str]":
    """Key: Value lines (first line — WARC/1.x or HTTP status — skipped
    by the caller when needed). Keys lower-cased; values stripped."""
    headers: "dict[str, str]" = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def parse_warc(data: bytes) -> "list[dict]":
    """Split a WARC blob (plain or per-record-gzip) into record dicts:
    ``warc_type, record_id, target_uri, warc_date, content_type,
    http_status, http_content_type, payload``. Stops at the first
    malformed record, returning everything parsed before it."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: "list[dict]" = []
    pos = 0
    while True:
        # skip inter-record CRLFs
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            break
        if not data[pos : pos + 5] == b"WARC/":
            break
        hdr_end = data.find(b"\r\n\r\n", pos, pos + _MAX_HEADER)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + length > len(data):
            break  # truncated final record
        payload = data[body_start : body_start + length]
        rec = {
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "http_content_type": None,
            "payload": payload,
        }
        if rec["warc_type"] == "response" and payload[:5] == b"HTTP/":
            http_end = payload.find(b"\r\n\r\n", 0, _MAX_HEADER)
            if http_end >= 0:
                status_line = payload.split(b"\r\n", 1)[0].split(b" ")
                if len(status_line) >= 2 and status_line[1].isdigit():
                    rec["http_status"] = int(status_line[1])
                http_headers = _parse_headers(payload[:http_end])
                rec["http_content_type"] = http_headers.get("content-type")
                rec["payload"] = payload[http_end + 4 :]
        records.append(rec)
        pos = body_start + length
    return records


_WARC_FIELDS = [
    T.StructField("rec_idx", T.IntegerType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("http_content_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
]


def warc_records(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Explode a binary WARC column into one row per record (other
    input columns carried through). One map-only Arrow pass; a blob
    with no parseable records contributes zero rows. For ``response``
    records ``payload`` is the HTTP BODY (headers split off into
    ``http_status`` / ``http_content_type``); for other record types
    it is the raw record block."""
    from polars_dataset_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    carry = [f for f in df.schema.fields if f.name != content_col]
    out_schema = T.StructType(carry + _WARC_FIELDS)

    def explode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = r[content_col]
                if blob is None:
                    continue
                for i, rec in enumerate(parse_warc(bytes(blob))):
                    base = {f.name: r[f.name] for f in carry}
                    base["rec_idx"] = i
                    base.update(rec)
                    rows.append(base)
            out = pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])
            for f in ("rec_idx", "http_status"):
                out[f] = pd.array(out[f] if len(rows) else [], dtype="Int32")
            yield out

    return df.mapInPandas(explode_batches, schema=out_schema)


def warc_record_at(data: bytes, offset: int, length: int) -> "dict | None":
    """Parse the ONE record at a CDX byte range. Per the Common Crawl
    index convention, ``offset``/``length`` address the record's
    per-record GZIP MEMBER inside the .warc.gz (a plain uncompressed
    range works too — the slice is sniffed). Returns the parse_warc
    record dict, or None when the range holds no parseable record."""
    if offset < 0 or length <= 0 or offset + length > len(data):
        return None
    recs = parse_warc(data[offset : offset + length])
    return recs[0] if recs else None


def fetch_warc_records(
    blobs: DataFrame,
    index: DataFrame,
    filename_col: str = "warc_filename",
    offset_col: str = "warc_offset",
    length_col: str = "warc_length",
    blob_filename_col: str = "filename",
    content_col: str = "content",
) -> DataFrame:
    """The CDX -> WARC fetch: materialize exactly the records an index
    selection names, by byte range — the whole point of the index (at
    archive scale these are ranged GETs; here the blob frame carries
    the files and the slice is local).

    Plan shape: the index selection collapses to ONE row per file (an
    array of (offset, length) wants — bounded by records-per-file),
    BROADCASTS, joins to the blob frame, and a map-only Arrow pass
    slices + parses each wanted range: blob bytes are never duplicated
    per record and never shuffle. Ranges that hold no parseable record
    yield one null-fields row (gate, not guess)."""
    from pyspark.sql import functions as F

    from polars_dataset_spark.session import ensure_parallelism

    wants = index.groupBy(F.col(filename_col).alias(blob_filename_col)).agg(
        F.collect_list(
            F.struct(
                F.col(offset_col).cast("long").alias("o"),
                F.col(length_col).cast("long").alias("l"),
            )
        ).alias("__wants")
    )
    joined = ensure_parallelism(
        blobs.join(F.broadcast(wants), on=blob_filename_col, how="inner")
    )
    carry = [
        f for f in joined.schema.fields if f.name not in (content_col, "__wants")
    ]
    out_schema = T.StructType(
        carry
        + [
            T.StructField("warc_offset", T.LongType()),
            T.StructField("warc_length", T.LongType()),
        ]
        + [f for f in _WARC_FIELDS if f.name != "rec_idx"]
    )

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = {f.name: None for f in _WARC_FIELDS if f.name != "rec_idx"}
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r[content_col]) if r[content_col] is not None else b""
                base = {f.name: r[f.name] for f in carry}
                for w in r["__wants"]:
                    off, ln = int(w["o"]), int(w["l"])
                    rec = warc_record_at(blob, off, ln)
                    rows.append({
                        **base, "warc_offset": off, "warc_length": ln,
                        **(rec if rec is not None else empty),
                    })
            out = pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])
            out["http_status"] = pd.array(
                out["http_status"] if len(rows) else [], dtype="Int32"
            )
            for c in ("warc_offset", "warc_length"):
                out[c] = pd.array(out[c] if len(rows) else [], dtype="Int64")
            yield out

    return joined.mapInPandas(fetch_batches, schema=out_schema)
