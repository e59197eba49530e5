"""Text PII detection and redaction — the scrubbing stage every
public-web training corpus runs (C4 removed lines with "dirty" tokens;
modern pipelines replace emails/phones/IPs with placeholders before
anything else sees the text).

Five pattern families, each a single RE2/Java-portable regex (no
lookaround, no backreferences — the IDENTICAL pattern string runs in
Spark's ``regexp_replace``/``regexp_count`` AND a DuckDB/RE2 oracle):

- ``email``   — local@domain.tld (practical superset of RFC 5322's
  common form; the +tag and dotted locals real corpora contain).
- ``ipv4``    — dotted quad with 0-255 octet guards (plain
  ``\\d{1,3}`` would eat version strings like 1.2.3.4000).
- ``ssn``     — US social security shape ddd-dd-dddd with the
  documented invalid prefixes (000, 666, 9xx) excluded.
- ``phone``   — +international (8-15 digits, optional separators) or
  North-American ``(ddd) ddd-dddd`` / ``ddd-ddd-dddd`` forms. Bare
  10-digit runs are NOT matched (they collide with ids/timestamps).
- ``cc``      — 13-16 digit payment-card runs, optionally space/dash
  grouped. Regex SHAPE only: a Luhn checksum is not expressible in a
  portable regex, so this family intentionally over-matches long digit
  runs — the right bias for a scrubber (false redactions are cheap,
  leaked cards are not). Documented, not hidden.

Redaction order is FIXED (email, ipv4, ssn, phone, cc): earlier
families consume text later ones would also match — an unseparated
+international number IS a 13-16-digit run, so phone must run before
cc claims it; the card family's 4-4-4-4 group widths can never satisfy
the phone patterns' 3-3-4 shape, so the order loses nothing. Counts
are SEQUENTIAL on the same chain (each family counts what the scrubber
would attribute to it after earlier families consumed their matches),
so ``n_<family>`` equals the number of ``[FAMILY]`` placeholders
``scrub_pii`` inserts — and a replayed oracle states one unambiguous
contract. The same order must be used in any replay.

Everything is pure codegen'd Column expressions over the scan — no
UDF, no shuffle, linear in corpus bytes at any SF.

Relationship to :func:`corpus.redact_pii` (q96): that is the
lightweight 3-family screen kept for its oracle contract; THIS module
is the production scrubber — richer families, validity guards, and
sequential attribution so counts equal placeholders inserted.

Reference envelope: `/root/reference/polars_dataset.py` has no text
surface; this is the driver-mandated LLM-pipeline extension family
(SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "PII_PLACEHOLDERS", "with_pii_counts", "scrub_pii"]

_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

# ORDERED dict: redaction applies in this exact sequence
PII_PATTERNS: "dict[str, str]" = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": rf"\b{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}\b",
    "ssn": r"\b(?:00[1-9]|0[1-9][0-9]|[1-578][0-9][0-9]|6[0-57-9][0-9]|66[0-57-9])-(?:0[1-9]|[1-9][0-9])-(?:[0-9]{3}[1-9]|[0-9]{2}[1-9][0-9]|[0-9][1-9][0-9]{2}|[1-9][0-9]{3})\b",
    "phone": r"(?:\+[0-9]{1,3}[ \-.]?)?(?:\([0-9]{3}\)[ \-.]?|[0-9]{3}[ \-.])[0-9]{3}[ \-.][0-9]{4}\b|\+[0-9]{8,15}\b",
    "cc": r"\b[0-9]{4}(?:[ \-]?[0-9]{4}){2}(?:[ \-]?[0-9]{1,4})\b",
}

PII_PLACEHOLDERS: "dict[str, str]" = {
    "email": "[EMAIL]",
    "ipv4": "[IP]",
    "ssn": "[SSN]",
    "cc": "[CARD]",
    "phone": "[PHONE]",
}


def with_pii_counts(
    df: DataFrame, text_col: str = "text", prefix: str = "n_"
) -> DataFrame:
    """Append one match-count column per PII family
    (``n_email, n_ipv4, n_ssn, n_phone, n_cc``) plus ``has_pii`` —
    the routing signal (quarantine / scrub / pass). Counts are
    SEQUENTIAL in the module's fixed order (each family counts on the
    text with earlier families already replaced), so ``n_<family>``
    equals the number of placeholders :func:`scrub_pii` inserts for
    it. Pure codegen ``regexp_count``/``regexp_replace`` chains."""
    out = df
    cur = F.col(text_col)
    for fam, rx in PII_PATTERNS.items():
        out = out.withColumn(
            f"{prefix}{fam}", F.regexp_count(cur, F.lit(rx)).cast("int")
        )
        cur = F.regexp_replace(cur, F.lit(rx), F.lit(PII_PLACEHOLDERS[fam]))
    flags = [F.col(f"{prefix}{fam}") > 0 for fam in PII_PATTERNS]
    has = flags[0]
    for fl in flags[1:]:
        has = has | fl
    return out.withColumn("has_pii", has)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: "str | None" = None,
    families: "list[str] | None" = None,
) -> DataFrame:
    """Replace every PII match with its family placeholder, applying
    the families in the module's FIXED order (restricted to
    ``families`` when given, order preserved). ``out_col`` defaults to
    replacing ``text_col`` in place. One chained ``regexp_replace``
    projection — map-only, whole-stage codegen."""
    target = out_col or text_col
    expr = F.col(text_col)
    for fam, rx in PII_PATTERNS.items():
        if families is not None and fam not in families:
            continue
        expr = F.regexp_replace(expr, F.lit(rx), F.lit(PII_PLACEHOLDERS[fam]))
    return df.withColumn(target, expr)
