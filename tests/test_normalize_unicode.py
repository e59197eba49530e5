"""normalize_unicode (functions/text): pinned NFKC facts, zero-width
stripping, whitespace collapse, form/flag variants, null passthrough."""

import pytest

from polars_dataset_spark.functions.text import normalize_unicode


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    out = normalize_unicode(df, **kw)
    return [r.text_norm for r in out.orderBy("id").collect()]


def test_nfkc_pinned_facts(spark):
    got = _run(
        spark,
        [
            "ﬁle ﬂow",          # ligatures
            "①②③ items",   # circled digits
            "ｈｅｌｌｏ　ｗｏｒｌｄ",
            "café menu",            # NFD combining acute
            "½ + ¼",            # vulgar fractions
        ],
    )
    assert got == [
        "file flow",
        "123 items",
        "hello world",
        "café menu",
        "1⁄2 + 1⁄4",
    ]


def test_zero_width_stripped(spark):
    (got,) = _run(spark, ["a​b‌c‍d­e﻿"])
    assert got == "abcde"


def test_zero_width_kept_when_disabled(spark):
    (got,) = _run(spark, ["a​b"], strip_zero_width=False)
    assert got == "a​b"


def test_whitespace_collapse_and_trim(spark):
    (got,) = _run(spark, ["  spaced   out\ttext\n"])
    assert got == "spaced out text"
    (raw,) = _run(spark, ["a  b"], collapse_whitespace=False)
    assert raw == "a  b"


def test_nfc_keeps_compatibility_chars(spark):
    (got,) = _run(spark, ["ﬁle"], form="NFC")
    assert got == "ﬁle"  # ligature survives NFC


def test_null_passthrough_and_bad_form(spark):
    (got,) = _run(spark, [None])
    assert got is None
    with pytest.raises(ValueError):
        normalize_unicode(
            spark.createDataFrame([(1, "x")], "id int, text string"),
            form="NFX",
        )
