"""IDN (punycode) host decoding + homograph flagging.

Internationalized domains travel as ASCII ``xn--`` labels (RFC 3492
punycode inside the RFC 5890 IDNA framing). A corpus keyed on raw
hosts treats ``xn--bcher-kva.de`` and ``bücher.de`` as different
origins — splitting domain priors, per-host budgets and dedup groups;
and the decoded form is where HOMOGRAPH abuse lives (``xn--pypal-4ve``
decodes to ``pаypal`` — latin letters with one Cyrillic ``а`` — the
classic phishing shape that pollutes a crawl's "high-quality brand
domain" buckets).

Two operators, composing with functions/urls.py:

- :func:`decode_idn_hosts` — per-label punycode decode (stdlib codec;
  pure batch map via Arrow-transferred pandas UDF — the decode tables
  are Python-side, same honest-UDF class as normalize_unicode).
  Invalid punycode NULLs the decoded host (gate, not guess) and is
  flagged; pure-ASCII hosts pass through with ``is_idn`` false.
- :func:`flag_homograph_hosts` — pure codegen over the DECODED host:
  a label mixing two of the confusable script classes
  (latin/cyrillic/greek, the :data:`~polars_dataset_spark.functions.
  text.SCRIPT_RANGES` ranges) in ONE label is the homograph signal;
  cross-label mixes (``mixed.рф``) are normal IDN usage and do not
  flag.

Reference envelope: `/root/reference/polars_dataset.py` has no web
surface; driver-mandated pipeline extension family (SURVEY §2.4).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["decode_idn_hosts", "flag_homograph_hosts"]

#: the confusable trio — script classes whose glyphs collide visually;
#: ranges shared with functions/text.SCRIPT_RANGES (and the SQL oracle)
CONFUSABLE_RANGES: "dict[str, str]" = {
    "latin": r"[A-Za-z]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "greek": r"[\x{0370}-\x{03FF}]",
}


def decode_label(label: str) -> "str | None":
    """One host label → its unicode form: ``xn--`` labels decode via
    the stdlib punycode codec (lowercased first — punycode digits are
    case-insensitive per RFC 3492 §5), other labels pass through.
    None on invalid punycode."""
    if not label.lower().startswith("xn--"):
        return label
    try:
        return label.lower()[4:].encode("ascii").decode("punycode")
    except (UnicodeError, ValueError):
        return None


def decode_idn_hosts(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "host_unicode",
) -> DataFrame:
    """Append ``host_unicode`` (the decoded host; null when the input
    is null or ANY label carries invalid punycode) and ``is_idn``
    (true when any ``xn--`` label is present, even invalid ones — the
    flag says "this host claimed IDN", the null says "and lied").
    Map-only Arrow pass, zero exchanges."""
    from polars_dataset_spark.session import ensure_parallelism

    df = ensure_parallelism(df)

    @F.pandas_udf("host_unicode string, is_idn boolean")
    def _decode(s: pd.Series) -> pd.DataFrame:
        decoded, flags = [], []
        for h in s:
            if h is None:
                decoded.append(None)
                flags.append(None)
                continue
            labels = str(h).split(".")
            is_idn = any(lbl.lower().startswith("xn--") for lbl in labels)
            out = [decode_label(lbl) for lbl in labels]
            decoded.append(None if any(o is None for o in out) else ".".join(out))
            flags.append(is_idn)
        return pd.DataFrame({"host_unicode": decoded, "is_idn": flags})

    staged = df.withColumn("__idn", _decode(F.col(host_col)))
    return staged.withColumns(
        {
            out_col: F.col("__idn.host_unicode"),
            "is_idn": F.col("__idn.is_idn"),
        }
    ).drop("__idn")


def flag_homograph_hosts(
    df: DataFrame,
    unicode_host_col: str = "host_unicode",
    out_col: str = "mixed_script_label",
) -> DataFrame:
    """Append ``out_col``: true when ANY single label of the decoded
    host mixes two of the confusable scripts (latin/cyrillic/greek) —
    ``pаypal`` flags, ``bücher`` (one script) and ``mixed.рф``
    (different scripts in different labels) do not. Null host → null.
    Pure codegen: split + one EXISTS higher-order predicate with the
    pairwise rlike tests — replayable verbatim in SQL."""
    h = F.col(unicode_host_col)
    pairs = [
        (CONFUSABLE_RANGES["latin"], CONFUSABLE_RANGES["cyrillic"]),
        (CONFUSABLE_RANGES["latin"], CONFUSABLE_RANGES["greek"]),
        (CONFUSABLE_RANGES["cyrillic"], CONFUSABLE_RANGES["greek"]),
    ]

    def label_mixes(lbl):
        test = None
        for a, b in pairs:
            t = lbl.rlike(a) & lbl.rlike(b)
            test = t if test is None else (test | t)
        return test

    return df.withColumn(
        out_col,
        F.when(h.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.exists(F.split(h, r"\."), label_mixes)
        ),
    )
