"""Regression tests for the round-7 self-review findings: the FLAC bps
range guard, collision-safe staging columns in the text scorers, the
staged with_model_quality, and the duplication detector's short-call /
adjacent-copy blind spots."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions.flac import encode_flac
from polars_dataset_spark.functions.text import (
    with_language_id,
    with_model_quality,
    with_quality_score,
    with_text_stats,
)
from polars_dataset_spark.plans import expensive_snippet_counts


def test_encode_flac_rejects_out_of_streaminfo_range_bps():
    # STREAMINFO stores bps-1 in 5 bits: 33 would wrap to a header claiming
    # bps=1 while subframes carry 33-bit samples — a silently undecodable
    # stream, so the encoder must refuse instead of emitting garbage
    for bad in (0, 3, 33, -8):
        with pytest.raises(ValueError, match="4..32"):
            encode_flac(np.zeros((64, 1), dtype=np.int64), bps=bad)


def test_text_scorers_preserve_caller_columns_named_like_staging(spark):
    # a caller column that collides with an internal staging name must
    # survive every scorer untouched (the staged rewrites replace-and-drop
    # their temp names; collision-checked names keep the old contract)
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", 99)],
        "doc_id long, text string, x long",
    )
    for stage_name in ("__ts_toks", "__q_toks", "__lid_toks", "__lid_best",
                       "__lid_en", "__mq_toks", "__mq_ntok"):
        tagged = docs.withColumn(stage_name, F.lit(7))
        for fn in (with_text_stats, with_quality_score, with_language_id,
                   with_model_quality):
            out = fn(tagged)
            assert stage_name in out.columns, (fn.__name__, stage_name)
            assert out.select(stage_name).first()[0] == 7, (fn.__name__, stage_name)


def test_with_model_quality_is_staged_and_value_stable(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog were friends"),
         (2, "!!! 123 ### 456 $$$"), (3, None)],
        "doc_id long, text string",
    )
    df = with_model_quality(docs)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly ONE tokenize chain in the plan (was ~6 inlined copies)
    assert plan.count("split(trim(lower") == 1
    rows = {r["doc_id"]: r["model_quality"] for r in df.collect()}
    # prose scores above noise; formula spot-check for doc 1:
    # n_tok=10, mtl=4.0 exactly ((44-9 ws)=35... recompute not needed —
    # the oracle (q143) value-checks the formula; here we pin ordering
    assert rows[1] > rows[2]
    assert 0.0 <= rows[2] <= 1.0


def test_snippet_detector_counts_short_call_copies(spark):
    # the blind-spot case: a SHORT expensive call (~47 chars with its
    # balanced parens) duplicated in one projection must count as N copies
    # of ONE frag, not N context-contaminated singletons
    df = spark.range(4).withColumn("text", F.concat(F.lit("a b c "), F.col("id")))
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    inlined = df.select(
        F.size(toks).alias("a"),
        F.size(F.array_distinct(toks)).alias("b"),
        F.element_at(toks, 1).alias("c"),
    )
    counts = expensive_snippet_counts(inlined)
    split_frags = {f: c for f, c in counts.items() if f.startswith("split(")}
    assert split_frags and max(split_frags.values()) >= 3, counts


def test_single_partition_detection_is_live_and_adjudicates(spark):
    # the old check — "Exchange SinglePartition" in explain_str(df) —
    # could NEVER fire (formatted explain splits node name and arguments
    # across lines); the consumer walk over the executed plan must flag a
    # keyless window (instance-scale single partition) and allow a final
    # global aggregate (one partial row per upstream partition)
    from pyspark.sql import Window

    from polars_dataset_spark.plans import (
        explain_str,
        has_unbounded_single_partition,
        single_partition_consumers,
    )

    df = spark.range(0, 1000, 1, 8)
    agg = df.groupBy().agg(F.sum("id").alias("s"))
    assert single_partition_consumers(agg) == ["HashAggregate"]
    assert not has_unbounded_single_partition(agg)
    kw = df.withColumn("r", F.row_number().over(Window.orderBy("id")))
    assert has_unbounded_single_partition(kw)
    # document WHY the substring form was dead: formatted explain really
    # does not contain the one-line node text, while the walk still fires
    assert "Exchange SinglePartition" not in explain_str(kw)


def test_python_path_detects_arrow_and_cogroup_stages(spark):
    from polars_dataset_spark.plans import is_python_path

    df = spark.range(8).withColumn("g", F.col("id") % 2)
    mia = df.mapInArrow(lambda it: it, "id long, g long")
    assert is_python_path(mia._jdf.queryExecution().executedPlan().toString())
    cg = df.groupBy("g").cogroup(df.groupBy("g")).applyInPandas(
        lambda a, b: a, "id long, g long"
    )
    assert is_python_path(cg._jdf.queryExecution().executedPlan().toString())
    assert not is_python_path(
        df.groupBy("g").count()._jdf.queryExecution().executedPlan().toString()
    )


def test_snippet_detector_survives_escaped_parens(spark):
    # a regex literal containing \( in the plan text must not desync the
    # balanced-paren scan: two copies of the same call still hash together
    df = spark.range(4).withColumn("t", F.concat(F.lit("x(y"), F.col("id")))
    chain = F.regexp_replace(F.col("t"), r"\(abcdefghijklmnopqrstuvwxyz", "_")
    inlined = df.select(F.length(chain).alias("a"), F.upper(chain).alias("b"))
    counts = expensive_snippet_counts(inlined)
    rr = {f: c for f, c in counts.items() if f.startswith("regexp_replace(")}
    assert rr and max(rr.values()) >= 2, counts


def test_staging_names_respect_reserved_out_col(spark):
    # a user naming the OUTPUT column like a staging base must get their
    # column, not have it dropped with the staging temps
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = with_language_id(docs, out_col="__lid_toks")
    assert "__lid_toks" in out.columns
    assert out.first()["__lid_toks"] == "en"
    out2 = with_quality_score(docs, out_col="__q_toks")
    assert "__q_toks" in out2.columns and 0.0 <= out2.first()["__q_toks"] <= 1.0


def test_repetition_stats_preserve_caller_toks_column(spark):
    from polars_dataset_spark.functions.text import with_repetition_stats

    docs = spark.createDataFrame(
        [(1, "a a a b", 42)], "doc_id long, text string, __toks long"
    )
    out = with_repetition_stats(docs)
    assert out.first()["__toks"] == 42  # caller column survives


def test_snippet_detector_counts_adjacent_copies(spark):
    # two copies of the same long chain closer together than the old
    # 120-char greedy window must BOTH count (finditer anchors on the
    # short "name(" token now, so the first match cannot swallow the second)
    df = spark.range(4).withColumn("t", F.concat(F.lit("x"), F.col("id")))
    chain = F.md5(F.concat(F.md5(F.col("t")), F.lit("salt-abcdefghijklmnop")))
    inlined = df.select(chain.alias("a"), chain.alias("b"))
    counts = expensive_snippet_counts(inlined)
    assert counts and max(counts.values()) >= 2, counts
