"""Leakage-safe train/val/test split (functions/shards.py).

q176 value-checks the whole pipeline against a recursive-CTE oracle;
these tests pin the properties the oracle states implicitly — the
no-leakage invariant itself, threshold exactness, and the degraded
per-doc path."""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import (
    leakage_safe_split,
    minhash_lsh_candidates,
    split_thresholds_hex,
)
from polars_dataset_spark.sources.tables import load_table


def test_thresholds_are_exact_and_ordered():
    b = split_thresholds_hex({"train": 0.8, "val": 0.1, "test": 0.1})
    assert b == [
        ("train", "ccccccccccccccc"),
        ("val", "e66666666666666"),
        ("test", "fffffffffffffff"),
    ]
    names, bounds = zip(*b)
    assert list(bounds) == sorted(bounds)
    # weights normalize: 8/1/1 is the same split as 0.8/0.1/0.1
    assert split_thresholds_hex({"train": 8, "val": 1, "test": 1}) == b


def test_thresholds_validate():
    with pytest.raises(ValueError):
        split_thresholds_hex({})
    with pytest.raises(ValueError):
        split_thresholds_hex({"a": 0.5, "b": -0.1})


def test_no_pair_straddles_the_boundary(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, threshold=0.7)
    out = leakage_safe_split(docs, pairs).select("doc_id", "component", "split")
    a = out.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    b = out.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    straddlers = (
        pairs.join(a, "id_a").join(b, "id_b").filter(F.col("split_a") != F.col("split_b"))
    )
    assert straddlers.count() == 0
    # the whole component shares one split, by construction AND in fact
    assert (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )


def test_split_proportions_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = leakage_safe_split(docs, None)  # per-doc hash split
    sizes = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(sizes.values())
    assert n == docs.count()
    # md5-uniform: train ≈ 80% within a loose tolerance on 500 docs
    assert 0.7 < sizes.get("train", 0) / n < 0.9
    again = {r["split"]: r["n"] for r in leakage_safe_split(docs, None).groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sizes == again


def test_salt_moves_clusters_atomically(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, threshold=0.7)
    v2 = leakage_safe_split(docs, pairs, salt="v2")
    # a different salt reshuffles WHICH split a cluster gets, but the
    # no-straddle invariant must hold for any salt
    assert (
        v2.groupBy("component").agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )
