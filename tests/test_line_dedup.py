"""Line-level dedup (functions/dedup.dedup_lines)."""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import dedup_lines


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "src1", "HEADER\nalpha beta\n\nFOOTER src1"),
        (2, "src1", "HEADER\ngamma delta\n\nFOOTER src1"),
        (3, "src2", "HEADER\nalpha beta\nFOOTER src2"),
        (4, "src2", "unique only\nHEADER"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_first_occurrence_wins_corpus_wide(docs):
    out = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    # doc 1 keeps everything (all first occurrences; blank kept)
    assert out[1]["text"] == "HEADER\nalpha beta\n\nFOOTER src1"
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 4
    # doc 2 loses HEADER and FOOTER src1, keeps its body + blank
    assert out[2]["text"] == "gamma delta\n"
    assert out[2]["n_kept"] == 2
    # doc 3 loses HEADER and the duplicated body, keeps its own footer
    assert out[3]["text"] == "FOOTER src2"
    # doc 4 loses only HEADER
    assert out[4]["text"] == "unique only"


def test_scoped_dedup(docs):
    out = {r["doc_id"]: r for r in dedup_lines(docs, scope_cols=["source"]).collect()}
    # within src2 the HEADER's first occurrence is doc 3
    assert out[3]["text"].startswith("HEADER\n")
    assert out[4]["text"] == "unique only"  # doc 4's HEADER deduped vs doc 3
    # within src1 doc 2 still loses HEADER and the src1 footer to doc 1
    assert out[2]["text"] == "gamma delta\n"
    assert "FOOTER src1" in out[1]["text"]


def test_blank_policy(spark):
    df = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "c\n\nd")], "doc_id long, text string"
    )
    keep = {r["doc_id"]: r["text"] for r in dedup_lines(df).collect()}
    assert keep[1] == "a\n\nb" and keep[2] == "c\n\nd"  # blanks always kept
    drop = {r["doc_id"]: r["text"] for r in dedup_lines(df, keep_blank=False).collect()}
    assert drop[1] == "a\n\nb" and drop[2] == "c\nd"  # second blank deduped


def test_all_lines_deduped_rebuilds_empty(spark):
    df = spark.createDataFrame([(1, "same"), (2, "same")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["text"] == "same"
    assert out[2]["text"] == "" and out[2]["n_kept"] == 0 and out[2]["n_lines"] == 1


def test_deterministic_across_partitionings(docs):
    a = sorted((r["doc_id"], r["text"]) for r in dedup_lines(docs).collect())
    b = sorted(
        (r["doc_id"], r["text"])
        for r in dedup_lines(docs.repartition(7, "doc_id")).collect()
    )
    assert a == b


def test_drop_frequent_lines_semantics(spark):
    from polars_dataset_spark.functions import drop_frequent_lines

    rows = [
        (1, "MENU\nunique one\nquote"),
        (2, "MENU\nunique two\nquote"),
        (3, "MENU\nunique three"),
        (4, "MENU\n\nunique four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in drop_frequent_lines(df, min_docs=3).collect()}
    # MENU (4 docs) removed EVERYWHERE, incl. its first occurrence
    for d in (1, 2, 3, 4):
        assert "MENU" not in out[d]["text"]
    # 'quote' (2 docs < 3) survives in both
    assert out[1]["text"] == "unique one\nquote"
    assert out[2]["text"] == "unique two\nquote"
    # blank lines always kept
    assert out[4]["text"] == "\nunique four"
    assert out[4]["n_lines"] == 3 and out[4]["n_kept"] == 2


def test_drop_frequent_lines_scoped(spark):
    from polars_dataset_spark.functions import drop_frequent_lines

    rows = [
        (1, "a", "NAV\nx"), (2, "a", "NAV\ny"), (3, "a", "NAV\nz"),
        (4, "b", "NAV\nw"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = {r["doc_id"]: r for r in drop_frequent_lines(df, min_docs=3, scope_cols=["src"]).collect()}
    # NAV crosses the bar only inside scope 'a'
    assert out[1]["text"] == "x" and out[3]["text"] == "z"
    assert out[4]["text"] == "NAV\nw"
