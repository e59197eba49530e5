"""Unit tests for the corpus-preparation operators (functions/corpus.py):
chunking arithmetic, vocab/OOV, surprisal, PII redaction, tf-idf."""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import (
    build_vocab,
    chunk_documents,
    dedup_chunks,
    redact_pii,
    tfidf_top_terms,
    with_oov_rate,
    with_surprisal,
)


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (0, "a b c d e f g h i j"),   # 10 tokens
        (1, "a b c"),                  # 3 tokens
        (2, ""),                       # empty
        (3, "a b c d e f g h i j"),    # duplicate of 0
        (4, "x y z z z"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_windows_cover_and_overlap(toy):
    out = chunk_documents(toy, max_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: 10 tokens, stride 2 -> chunks start at 0,2,4,6 (6+4 >= 10)
    c0 = sorted(by_doc[0], key=lambda r: r.chunk_idx)
    assert [r.chunk_text for r in c0] == ["a b c d", "c d e f", "e f g h", "g h i j"]
    assert all(r.n_tokens == 4 for r in c0)
    # doc 1 fits one window
    assert [r.chunk_text for r in by_doc[1]] == ["a b c"]
    # empty doc still yields exactly one (empty) chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == ""
    assert by_doc[2][0].n_tokens == 0


def test_chunk_last_window_partial(toy):
    out = chunk_documents(toy.filter("doc_id = 0"), max_tokens=4, overlap=1).collect()
    texts = [r.chunk_text for r in sorted(out, key=lambda r: r.chunk_idx)]
    # stride 3: starts 0,3,6 -> 6+4 >= 10 ends coverage at token 10
    assert texts == ["a b c d", "d e f g", "g h i j"]


def test_dedup_chunks_keeps_first(toy):
    chunks = chunk_documents(toy, max_tokens=4, overlap=2)
    kept = dedup_chunks(chunks).collect()
    # doc 3 duplicates doc 0 exactly -> all its chunks lose to doc 0's
    assert not [r for r in kept if r.doc_id == 3]
    assert len([r for r in kept if r.doc_id == 0]) == 4


def test_vocab_and_oov(toy):
    vocab = build_vocab(toy, top_v=3)
    rows = vocab.collect()
    # corpus counts: a=3 b=3 c=3 d..j=2 each, x=1 y=1 z=3 -> top3 by
    # (cnt desc, token asc) = a, b, c
    assert [r.token for r in rows] == ["a", "b", "c"]
    oov = {r.doc_id: r for r in with_oov_rate(toy, vocab).collect()}
    assert oov[1].n_oov == 0 and oov[1].oov_frac == 0.0
    assert oov[4].n_oov == 5 and oov[4].oov_frac == 1.0
    assert 2 not in oov  # token-less docs absent


def test_surprisal_uniform_vs_rare(spark):
    df = spark.createDataFrame(
        [(0, "a a a a"), (1, "q")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.surprisal_bits for r in with_surprisal(df).collect()}
    # p(a)=4/5, p(q)=1/5 -> doc0 bits = log2(5/4), doc1 = log2(5)
    assert out[0] == pytest.approx(0.3219, abs=1e-4)
    assert out[1] == pytest.approx(2.3219, abs=1e-4)


def test_bigram_surprisal_detects_shuffled_text(spark):
    """The property the bigram model adds over unigram: a document built
    from the SAME tokens in an unfamiliar order must score higher than
    the repeated familiar sequence, while unigram surprisal ties them."""
    from polars_dataset_spark.functions import with_bigram_surprisal

    fluent = "the cat sat on the mat"
    shuffled = "mat the on sat cat the"
    # the corpus LM is trained on ALL docs: fluent word order dominates,
    # the shuffled one-off's bigrams are corpus-rare
    rows = [(i, fluent) for i in range(10)]
    rows += [(10, shuffled), (11, "solo"), (12, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uni = {r.doc_id: r.surprisal_bits for r in with_surprisal(df).collect()}
    assert uni[0] == pytest.approx(uni[10], abs=1e-4)  # unigram can't tell
    out = {r.doc_id: r for r in with_bigram_surprisal(df).collect()}
    assert out[10].bigram_surprisal_bits > out[0].bigram_surprisal_bits
    assert out[0].n_bigrams == out[10].n_bigrams == 5
    assert 11 not in out and 12 not in out  # <2 tokens -> absent


def test_redact_pii_all_types(spark):
    df = spark.createDataFrame(
        [(0, "mail bob.smith+x@corp.example.org node 192.168.0.1 call 555-1234 done"),
         (1, "clean text, no pii 1.2 ok")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[0].text_redacted == "mail <EMAIL> node <IP> call <PHONE> done"
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (1, 1, 1)
    assert out[1].text_redacted == out[1].text
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (0, 0, 0)


def test_tfidf_rank_is_integer_deterministic(spark):
    df = spark.createDataFrame(
        [(0, "apple apple banana cherry"),
         (1, "banana banana banana date"),
         (2, "cherry date date apple")],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: banana tf=3 first; date (df=2) before any tf-1 tie with lower df
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert d1[0].token == "banana" and d1[0].tf == 3
    assert d1[1].token == "date"
    # every doc got exactly k rows and ranks are 1..k
    for rows in by_doc.values():
        assert sorted(r.rank for r in rows) == [1, 2]


def test_kl_divergence_properties(spark):
    from polars_dataset_spark.functions import kl_divergence_by

    docs = spark.createDataFrame(
        [
            (1, "a", "x x y"), (2, "a", "x y y"),   # source a: {x:3, y:3}
            (3, "b", "x x x"), (4, "b", "x x x"),   # source b: all x
        ],
        "doc_id long, source string, text string",
    )
    got = {r.source: r for r in kl_divergence_by(docs, group_col="source").collect()}
    # corpus: x=9, y=3 → p_c = (.75, .25); a=(.5,.5); b=(1,0)
    import math
    kl_a = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    kl_b = 1.0 * math.log(1.0 / 0.75)
    assert abs(got["a"].kl - kl_a) < 1e-12 and got["a"].n_tokens == 6
    assert abs(got["b"].kl - kl_b) < 1e-12 and got["b"].n_tokens == 6
    assert got["a"].kl > 0 and got["b"].kl > 0  # Gibbs: KL >= 0
