"""PDF inventory probing — header/trailer byte arithmetic, no parsing
stack.

PDFs dominate the *document* bytes of a real crawl the way MP3/MP4
dominate its media bytes; a curation pipeline needs to inventory them
(route to a text-extraction service, budget OCR, drop encrypted files)
long before anything can afford to parse them. This prober is the same
contract as ``media_probe``/``probe_av_header``: bounded byte scans
from the public spec (ISO 32000 / PDF 1.x), one map-only Arrow pass,
and honest ``None`` where the answer genuinely needs object decoding.

What is extracted, and from where:

- ``version`` — the ``%PDF-1.x`` header comment (spec §7.5.2), with
  the ``/Version`` catalog override ignored (needs object resolution).
- ``page_count`` — the largest ``/Count N`` of any visible
  ``/Type /Pages`` node: exact for classically-written files (the root
  page-tree node's /Count is the total page count, and child nodes
  count subsets, so the max IS the root's). In PDF 1.5+ files whose
  page tree lives inside compressed object streams the node is not
  visible to a byte scan — ``page_count`` is None there, NOT a guess
  (documented gate, same honesty rule as the VP8 decode gate).
- ``encrypted`` — a ``/Encrypt`` key in a trailer dictionary
  (spec §7.6: present iff the file has an encryption dictionary).
- ``linearized`` — a ``/Linearized`` dict within the first 1 KiB
  (Annex F: must be the first object to count as web-optimized).
- ``n_objects`` — count of visible ``N G obj`` headers: a lower bound
  when object streams are in play (reported as-is; complements
  page_count's gate rather than hiding it).

Reference envelope: `/root/reference/polars_dataset.py` has no media
or document surface; this extends the driver-mandated multimodal
inventory family (q201/q202/q204).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_VERSION_RE = re.compile(rb"^%PDF-(\d+\.\d+)")
_PAGES_RE = re.compile(
    rb"/Type\s*/Pages\b(?P<body>[^>]{0,512}?)/Count\s+(?P<count>\d+)"
    rb"|/Count\s+(?P<count2>\d+)(?P<body2>[^>]{0,512}?)/Type\s*/Pages\b"
)
_OBJ_RE = re.compile(rb"\b\d+\s+\d+\s+obj\b")
# /Encrypt is only meaningful inside a trailer dict or the XRef-stream
# dict that plays one (PDF 1.5+) — anchor the search there so the token
# inside an ordinary content stream can't false-positive (ADVICE r9)
_TRAILER_RE = re.compile(rb"\btrailer\b|/Type\s*/XRef\b")

_SCAN_CAP = 8 << 20  # bound the regex scans on adversarial blobs (8 MiB)


def _is_encrypted(body: bytes) -> bool:
    """True when an ``/Encrypt`` key is byte-visible inside a trailer
    dict or an XRef-stream dict (the two places the spec puts it). The
    ``trailer`` keyword's dict FOLLOWS it; a ``/Type /XRef`` dict may
    open before the token, so that anchor also looks back — bounded at
    the previous object/stream end. Both windows stop at the first
    ``stream``/``startxref`` so a content-stream body painted with the
    literal token can't false-positive."""
    for m in _TRAILER_RE.finditer(body):
        if body.startswith(b"trailer", m.start()):
            lo = m.end()
        else:
            lo = max(0, m.start() - 1024)
            prev_end = max(
                body.rfind(b"endobj", lo, m.start()),
                body.rfind(b"endstream", lo, m.start()),
            )
            if prev_end >= 0:
                lo = prev_end
        window = body[lo : m.end() + 2048]
        rel = m.end() - lo
        stops = [i for i in (window.find(b"stream", rel), window.find(b"startxref", rel)) if i >= 0]
        if stops:
            window = window[: min(stops)]
        if b"/Encrypt" in window:
            return True
    return False


def probe_pdf(data: bytes) -> "dict | None":
    """Inventory fields from a PDF blob's visible structure. Returns
    ``None`` when the ``%PDF-`` signature is absent; otherwise a dict
    ``{version, page_count, encrypted, linearized, n_objects}`` with
    ``page_count`` None when no page-tree node is byte-visible (object
    streams — a gate, not a guess)."""
    m = _VERSION_RE.match(data[:16])
    if m is None:
        return None
    body = data[:_SCAN_CAP]
    counts = [
        int(g.group("count") or g.group("count2"))
        for g in _PAGES_RE.finditer(body)
    ]
    encrypted = _is_encrypted(body)
    linearized = b"/Linearized" in data[:1024]
    return {
        "version": m.group(1).decode("ascii"),
        "page_count": max(counts) if counts else None,
        "encrypted": encrypted,
        "linearized": linearized,
        "n_objects": len(_OBJ_RE.findall(body)),
    }


_PDF_FIELDS = [
    T.StructField("version", T.StringType()),
    T.StructField("page_count", T.IntegerType()),
    T.StructField("encrypted", T.BooleanType()),
    T.StructField("linearized", T.BooleanType()),
    T.StructField("n_objects", T.IntegerType()),
]


def pdf_probe(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach PDF inventory columns to every binary blob — one map-only
    Arrow pass, bounded byte scans, no object/stream decoding. Non-PDF
    blobs get all-null fields."""
    from polars_dataset_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    out_schema = T.StructType(df.schema.fields + _PDF_FIELDS)
    empty = {f.name: None for f in _PDF_FIELDS}

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for blob in pdf_batch[content_col]:
                info = probe_pdf(bytes(blob)) if blob is not None else None
                rows.append(info or empty)
            out = pdf_batch.copy()
            for f in _PDF_FIELDS:
                col = [r.get(f.name) for r in rows]
                if f.dataType == T.IntegerType():
                    out[f.name] = pd.array(col, dtype="Int32")
                elif f.dataType == T.BooleanType():
                    out[f.name] = pd.array(col, dtype="boolean")
                else:
                    out[f.name] = pd.array(col, dtype="object")
            yield out

    return df.mapInPandas(probe_batches, schema=out_schema)
