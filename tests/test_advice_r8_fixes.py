"""Regression tests for the round-8 ADVICE findings.

1. plans.inspect depth() counted whole-stage-codegen markers ("*(2) ") as
   tree indentation, so POST-execution plan strings (AQE isFinalPlan=true
   renders codegen stars) made the consumer walk skip the real consumer
   and report a bounded global aggregate as an unbounded single
   partition. Run-then-audit is the natural usage order, so this made
   ``Dataset.scale_report()`` lie exactly when users would call it.
2. The "==" wrapper entry was unreachable (head() strips '='); the AQE
   section headers resolve to "Final"/"Initial" and leaked as consumers.
3. is_python_path() matched lowercase substrings anywhere in the plan
   text, so a string LITERAL in a predicate (e.g. comparing a column
   against 'MapInPandas') false-positived the python_udf flag.
4. flac: bps=32 emitted frame-header sample-size code 7, which
   pre-RFC-9639 decoders treat as reserved; code 0 (get-from-STREAMINFO)
   is honored by every generation.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.plans import inspect as PI


def _global_sum(spark):
    return spark.range(0, 1000, 1, 8).agg(F.sum("id").alias("s"))


def test_single_partition_walk_pre_execution_bounded(spark):
    df = _global_sum(spark)
    assert not PI.has_unbounded_single_partition(df)
    cons = PI.single_partition_consumers(df)
    assert cons, "a global agg must have a single-partition exchange"
    assert all(c in {"HashAggregate", "SortAggregate", "ObjectHashAggregate"} for c in cons)


def test_single_partition_walk_post_execution_bounded(spark):
    # the ADVICE repro: same df reported False pre-collect, True
    # post-collect, because the executed plan renders codegen stars and
    # the old depth() mis-measured starred consumer lines
    df = _global_sum(spark)
    df.collect()
    cons = PI.single_partition_consumers(df)
    assert cons
    assert all(
        c in {"HashAggregate", "SortAggregate", "ObjectHashAggregate"} for c in cons
    ), f"post-execution consumer walk mis-attributed: {cons}"
    assert not PI.has_unbounded_single_partition(df)
    assert PI.scale_report(df)["single_partition"] is False


def test_single_partition_walk_headers_not_consumers(spark):
    # "Final"/"Initial"/"AdaptiveSparkPlan" must never surface as the
    # consumer of an exchange (they are AQE wrappers/section headers)
    df = _global_sum(spark)
    df.collect()
    cons = PI.single_partition_consumers(df)
    assert not set(cons) & {"Final", "Initial", "AdaptiveSparkPlan", "<root>"}


def test_unbounded_single_partition_still_detected(spark):
    # a global (keyless) window is the true red-flag shape — must still trip
    from pyspark.sql import Window

    df = spark.range(0, 100, 1, 8).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    df.collect()
    assert PI.has_unbounded_single_partition(df)


def test_is_python_path_ignores_string_literals(spark):
    df = spark.range(0, 10, 1, 2).withColumn("tag", F.lit("MapInPandas runs inArrow"))
    df = df.filter(F.col("tag") != "FlatMapCoGroupsInPandas")
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in text  # the literal really is in the plan text
    assert not PI.is_python_path(text)
    assert PI.scale_report(df)["python_udf"] is False


def test_is_python_path_detects_real_nodes(spark):
    import pandas as pd

    def ident(it):
        for b in it:
            yield b

    df = spark.range(0, 10, 1, 2).mapInPandas(ident, "id long")
    assert PI.is_python_path(df._jdf.queryExecution().executedPlan().toString())
    # codegen-starred / row-UDF node names also match at line heads
    assert PI.is_python_path("+- *(2) ArrowEvalPython [f(x)#1]")
    assert PI.is_python_path("   +- BatchEvalPython [g(y)#2]")
    assert not PI.is_python_path("+- Filter (name#3 = arrowevalpython)")


def test_flac_bps32_uses_streaminfo_sample_size_code():
    from polars_dataset_spark.functions.flac import decode_flac, encode_flac

    # a full-range 32-bit ramp: spans the whole depth (so a 16-bit header
    # mislabel would corrupt values) while keeping order-2 residuals tiny
    # (the fixture encoder's Rice coder has no escape partitions, so
    # full-range RANDOM 32-bit data would explode its unary runs)
    pcm = np.linspace(-(2**31), 2**31 - 1, 256, dtype=np.int64).reshape(-1, 1)
    blob = encode_flac(pcm, rate=44100, bps=32)
    # frame header: after the 4-byte stream marker + STREAMINFO block the
    # first frame starts at the sync code 0x3FFE; byte 3 of the header
    # packs channel(4) | sample-size(3) | reserved(1) — sample-size must
    # be 0 (get-from-STREAMINFO), not the RFC-9639-only code 7
    idx = blob.index(b"\xff\xf8", 4)
    ss_code = (blob[idx + 3] >> 1) & 0x7
    assert ss_code == 0
    rate, nch, frames = decode_flac(blob)
    assert (rate, nch) == (44100, 1)
    # the decoder normalizes by 2^(bps-1); same exact division here, so a
    # header-depth mislabel (e.g. decoding as 16-bit) would mismatch
    assert np.array_equal(
        np.asarray(frames).reshape(-1), pcm.reshape(-1) / float(1 << 31)
    )
