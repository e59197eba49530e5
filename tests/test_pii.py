"""PII detection + redaction (functions/pii, r11): pattern-family
behavior, fixed redaction order, Spark operators, and portability of
the patterns across engines (python re / Spark Java regex / DuckDB
RE2 must agree — the q221 oracle depends on it)."""

import re

import duckdb
import pytest

from polars_dataset_spark.functions.pii import (
    PII_PATTERNS,
    PII_PLACEHOLDERS,
    scrub_pii,
    with_pii_counts,
)

SAMPLE = (
    "mail alice.smith+x@ex.co.uk from 192.168.0.1, ssn 123-45-6789, "
    "card 4111 1111 1111 1111, call (415) 555-2671 or +4915123456789"
)


def test_families_match_expected_sequentially():
    # sequential attribution (the module contract): each family counts
    # on the text with earlier families already consumed — so the
    # unseparated +international phone is NOT double-counted by cc
    text = SAMPLE
    hits = {}
    for fam, rx in PII_PATTERNS.items():
        hits[fam] = len(re.findall(rx, text))
        text = re.sub(rx, PII_PLACEHOLDERS[fam], text)
    assert hits == {"email": 1, "ipv4": 1, "ssn": 1, "phone": 2, "cc": 1}
    assert list(PII_PATTERNS) == ["email", "ipv4", "ssn", "phone", "cc"]
    # raw overlap that motivates the order: cc alone would claim the
    # +international number too
    assert len(re.findall(PII_PATTERNS["cc"], SAMPLE)) == 2


def test_negative_space():
    clean = "version 1.2.3.4000 built 2026-08-16 at 10:30, id 4155552671, order 12-34"
    for fam, rx in PII_PATTERNS.items():
        assert not re.search(rx, clean), fam


def test_redaction_order_is_stable():
    # python replay of the fixed order must fully clean the sample
    text = SAMPLE
    for fam, rx in PII_PATTERNS.items():
        text = re.sub(rx, PII_PLACEHOLDERS[fam], text)
    assert text == (
        "mail [EMAIL] from [IP], ssn [SSN], card [CARD], call [PHONE] or [PHONE]"
    )


def test_patterns_are_engine_portable():
    """The q221 oracle replays the same strings in DuckDB (RE2) and
    Spark (Java regex) — all three engines must count identically."""
    con = duckdb.connect()
    for fam, rx in PII_PATTERNS.items():
        py = len(re.findall(rx, SAMPLE))
        duck = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [SAMPLE, rx]
        ).fetchone()[0]
        assert duck == py, f"{fam}: duckdb {duck} != python {py}"


def test_spark_counts_and_scrub(spark):
    df = spark.createDataFrame(
        [(0, SAMPLE), (1, "totally clean prose"), (2, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_pii(with_pii_counts(df), out_col="s").collect()}
    r0 = got[0]
    assert (r0.n_email, r0.n_ipv4, r0.n_ssn, r0.n_cc, r0.n_phone) == (1, 1, 1, 1, 2)
    assert r0.has_pii is True
    assert r0.s == (
        "mail [EMAIL] from [IP], ssn [SSN], card [CARD], call [PHONE] or [PHONE]"
    )
    assert got[1].has_pii is False and got[1].s == "totally clean prose"
    assert got[2].s is None and got[2].has_pii is None


def test_scrub_family_subset(spark):
    df = spark.createDataFrame([(0, SAMPLE)], "doc_id long, text string")
    out = scrub_pii(df, families=["email"]).first().text
    assert "[EMAIL]" in out and "123-45-6789" in out  # ssn untouched


def test_plan_is_codegen_projection(spark):
    df = spark.createDataFrame([(0, SAMPLE)], "doc_id long, text string")
    plan = (
        scrub_pii(with_pii_counts(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
