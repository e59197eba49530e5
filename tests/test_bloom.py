"""Partitioned Bloom filter (functions/bloom): the no-false-negative
guarantee, measured FP rate vs the configured bound, bucket geometry,
empty-bucket gates, and determinism."""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions.bloom import bloom_build, bloom_probe


def _urls(spark, lo, hi, tag="m"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"http://{tag}.example/p"), F.col("id").cast("string")
                 ).alias("url")
    )


def test_no_false_negatives(spark):
    members = _urls(spark, 0, 2000)
    idx = bloom_build(members, fp_rate=0.01)
    probed = bloom_probe(idx, members)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_fp_rate_within_bound(spark):
    members = _urls(spark, 0, 2000)
    idx = bloom_build(members, fp_rate=0.01)
    strangers = _urls(spark, 50_000, 54_000)  # disjoint keys
    fp = bloom_probe(idx, strangers).filter(F.col("might_contain")).count()
    # 4000 strangers at target 1%: allow generous 3x slack
    assert fp <= 0.03 * 4000, fp


def test_geometry_and_bitmap_rows(spark):
    members = _urls(spark, 0, 1000)
    idx = bloom_build(members, fp_rate=0.01, n_buckets=8)
    assert idx.n_buckets == 8
    assert idx.m_bits % 64 == 0
    assert 1 <= idx.n_hashes <= 16
    rows = idx.bitmaps.collect()
    assert 1 <= len(rows) <= 8
    assert all(len(bytes(r.bitmap)) == idx.m_bits // 8 for r in rows)


def test_probe_carries_columns_and_handles_empty_buckets(spark):
    members = _urls(spark, 0, 50)
    idx = bloom_build(members, fp_rate=0.01, n_buckets=64)
    probe_df = _urls(spark, 0, 50).withColumn("tag", F.lit("x"))
    out = bloom_probe(idx, probe_df)
    assert set(out.columns) == {"url", "tag", "might_contain"}
    assert out.filter(~F.col("might_contain")).count() == 0


def test_deterministic_across_builds(spark):
    a = bloom_build(_urls(spark, 0, 500), fp_rate=0.05, n_buckets=4)
    b = bloom_build(_urls(spark, 0, 500), fp_rate=0.05, n_buckets=4)
    ra = {r.bloom_bucket: bytes(r.bitmap) for r in a.bitmaps.collect()}
    rb = {r.bloom_bucket: bytes(r.bitmap) for r in b.bitmaps.collect()}
    assert ra == rb


def test_bad_fp_rate_raises(spark):
    with pytest.raises(ValueError):
        bloom_build(_urls(spark, 0, 10), fp_rate=1.5)
