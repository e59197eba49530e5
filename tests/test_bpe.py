"""Distributed BPE training/encoding (functions/bpe.py) vs a direct
reference implementation."""

import collections

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import bpe_apply, bpe_learn, merge_sequence
from polars_dataset_spark.functions.bpe import EOW


def ref_bpe(texts, n_merges):
    """Direct single-machine BPE (Sennrich et al. pseudocode)."""
    vocab = collections.Counter()
    for t in texts:
        for tok in t.lower().split():
            vocab[tok] += 1
    seqs = {t: list(t) + [EOW] for t in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for t, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[t]
        if not pairs:
            break
        # deterministic tie-break: max count, then lexicographically least
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        seqs = {t: merge_sequence(s, best) for t, s in seqs.items()}
    return merges


TEXTS = [
    "the cat sat on the mat",
    "the cats sat",
    "a hat and a mat and a cat",
    "that cat that sat",
    "bats rats cats mats",
]


def test_merge_sequence_left_to_right():
    assert merge_sequence(list("aaaa"), ("a", "a")) == ["aa", "aa"]
    assert merge_sequence(list("aaa"), ("a", "a")) == ["aa", "a"]
    assert merge_sequence(["a", "b", "b"], ("a", "b")) == ["ab", "b"]
    assert merge_sequence(["x", "a", "b", "y"], ("a", "b")) == ["x", "ab", "y"]
    assert merge_sequence([], ("a", "b")) == []


def test_learn_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id long, text string")
    merges, table = bpe_learn(df, n_merges=6)
    assert merges == ref_bpe(TEXTS, 6)
    rows = sorted(table.collect(), key=lambda r: r["rank"])
    assert [(r["left"], r["right"]) for r in rows] == merges
    # counts strictly positive and the chosen pair's count is the max
    assert all(r["pair_count"] > 0 for r in rows)


def test_learn_deterministic(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id long, text string")
    a, _ = bpe_learn(df.repartition(7), n_merges=5)
    b, _ = bpe_learn(df.repartition(2), n_merges=5)
    assert a == b


def test_apply_roundtrip_consistency(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id long, text string")
    merges, _ = bpe_learn(df, n_merges=6)
    enc = bpe_apply(df, merges)
    for r in enc.collect():
        toks = r["text"].lower().split()
        # concatenating the pieces reproduces the original tokens + EOW markers
        joined = "".join(r["bpe_tokens"]).replace(EOW, " ").split()
        assert joined == toks
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
        # every piece is either a learned merge product or a single char/EOW
        learned = {a + b for a, b in merges}
        for p in r["bpe_tokens"]:
            base = p[:-4] if p.endswith(EOW) else p
            assert p in learned or len(base) <= 1 or p == EOW


def test_apply_empty_and_null(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "ok")], "id long, text string")
    out = {r["id"]: r for r in bpe_apply(df, [("o", "k")]).collect()}
    assert out[1]["bpe_tokens"] == [] and out[1]["n_bpe_tokens"] == 0
    assert out[2]["bpe_tokens"] == [] and out[2]["n_bpe_tokens"] == 0
    assert out[3]["bpe_tokens"] == ["ok", EOW]
