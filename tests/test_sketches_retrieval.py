"""BM25 retrieval, Count-Min / portable-HLL sketches, MAD outliers and
content-defined chunking (functions/retrieval.py, frequency.py,
profiling.py numeric_outliers, dedup.py cdc_chunks)."""

import math

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import (
    bm25_topk,
    cdc_chunks,
    cms_estimate,
    hll_summary,
    numeric_outliers,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark shuffles data across the cluster"),
        (2, "spark spark spark joins tables"),
        (3, "a tiny document about nothing"),
        (4, "joins and shuffles dominate cost"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- BM25


def test_bm25_matches_reference(corpus):
    got = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, "spark joins", k=5).collect()}
    # reference computation, straight from the formula
    docs = {
        1: "spark shuffles data across the cluster".split(),
        2: "spark spark spark joins tables".split(),
        3: "a tiny document about nothing".split(),
        4: "joins and shuffles dominate cost".split(),
        5: [],
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    want = {}
    for d, toks in docs.items():
        s = 0.0
        for term in ("spark", "joins"):
            tf = toks.count(term)
            if not tf:
                continue
            df = sum(term in t for t in docs.values())
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        if s:
            want[d] = round(s, 6)
    assert got == want
    # doc 2 (3x spark + joins) outranks everything
    assert max(want, key=want.get) == 2


def test_bm25_k_cut_and_validation(corpus):
    assert bm25_topk(corpus, "spark joins", k=1).count() == 1
    with pytest.raises(ValueError):
        bm25_topk(corpus, "   ", k=5)
    with pytest.raises(ValueError):
        bm25_topk(corpus, "spark", k=0)


def test_bm25_no_match_is_empty(corpus):
    assert bm25_topk(corpus, "zzz_not_a_word", k=3).count() == 0


# ------------------------------------------------------- Count-Min sketch


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    rows = [(f"k{i % 7}",) for i in range(700)]
    df = spark.createDataFrame(rows, "v string")
    keys = [f"k{i}" for i in range(7)] + ["absent"]
    est = {r["item"]: r["est"] for r in cms_estimate(df, "v", keys, depth=4, width=1024).collect()}
    # wide sketch, 7 keys: collisions are possible but min-over-4-rows
    # with 7 items in 1024 buckets is exact with overwhelming margin
    for i in range(7):
        assert est[f"k{i}"] == 100
    assert est["absent"] == 0


def test_cms_narrow_width_still_bounds(spark):
    rows = [(f"k{i % 50}",) for i in range(500)]
    df = spark.createDataFrame(rows, "v string")
    keys = [f"k{i}" for i in range(50)]
    out = cms_estimate(df, "v", keys, depth=2, width=8).collect()
    for r in out:
        assert r["est"] >= 10  # exact count per key


def test_cms_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        cms_estimate(df, "v", [], depth=4, width=8)
    with pytest.raises(ValueError):
        cms_estimate(df, "v", ["a"], depth=0, width=8)


# ------------------------------------------------------------ portable HLL


def test_hll_register_definition(spark):
    # one known value: recompute bucket/rho in python over the same md5
    import hashlib

    df = spark.createDataFrame([("x",)], "v string")
    row = hll_summary(df, "v", p=8).collect()[0]
    h = int(hashlib.md5(b"hll:x").hexdigest()[:15], 16)
    w = h >> 8
    rho = 53 - (w.bit_length()) if w else 53
    assert row["nonzero_buckets"] == 1
    assert row["sum_registers"] == rho == row["max_register"]
    assert row["harmonic_sum"] == 2.0**-rho + 255.0


def test_hll_accuracy_over_cardinalities(spark):
    for n in (50, 2000, 20000):
        df = spark.range(n).select(F.col("id").cast("string").alias("v"))
        row = hll_summary(df, "v", p=8).collect()[0]
        est = row["corrected_estimate"]
        assert abs(est / n - 1) < 0.2, (n, est)


def test_hll_merge_invariance(spark):
    # partitioning cannot change a register table built via max
    df1 = spark.range(1000).repartition(1).select(F.col("id").cast("string").alias("v"))
    df32 = spark.range(1000).repartition(32).select(F.col("id").cast("string").alias("v"))
    assert hll_summary(df1, "v").collect() == hll_summary(df32, "v").collect()


# ------------------------------------------------------------ MAD outliers


def test_numeric_outliers_exact_medians(spark):
    vals = [10, 12, 11, 13, 12, 11, 100]  # 100 is the outlier
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "doc_id long, x long")
    out = numeric_outliers(df, "x", c=3.5).collect()
    med = sorted(vals)[3]  # 12
    mad = sorted(abs(v - med) for v in vals)[3]  # 1
    flagged = {r["doc_id"] for r in out if r["is_outlier"]}
    assert flagged == {6}
    assert all(r["median"] == med and r["mad"] == mad for r in out)


def test_numeric_outliers_even_count_midpoint(spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate([1, 2, 3, 4])], "doc_id long, x long")
    out = numeric_outliers(df, "x", c=1.0).collect()
    assert all(r["median"] == 2.5 and r["mad"] == 1.0 for r in out)
    assert {r["doc_id"] for r in out if r["is_outlier"]} == {0, 3}


# ------------------------------------------------------------ CDC chunking


def _rebuild(rows):
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    return {
        d: "".join(c["chunk_text"] for c in sorted(cs, key=lambda c: c["chunk_idx"]))
        for d, cs in by_doc.items()
    }


def test_cdc_rebuild_exact(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "short"),
        (3, ""),
        (4, "x" * 100),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df, window=8, mask_bits=4).collect()
    rebuilt = _rebuild(out)
    assert rebuilt == {d: t for d, t in rows}
    # offsets are consistent: start of chunk i+1 == start + len of chunk i
    for d in rebuilt:
        cs = sorted([r for r in out if r["doc_id"] == d], key=lambda r: r["chunk_idx"])
        pos = 0
        for c in cs:
            assert c["chunk_start"] == pos
            pos += c["chunk_len"]


def test_cdc_boundaries_shift_invariant(spark):
    """The CDC property: prepending text changes only chunks BEFORE the
    first post-edit boundary — later chunk hashes are unchanged."""
    base = "the quick brown fox jumps over the lazy dog " * 20
    df = spark.createDataFrame(
        [(1, base), (2, "EDITEDEDITED" + base)], "doc_id long, text string"
    )
    out = cdc_chunks(df, window=8, mask_bits=4).collect()
    h1 = [r["chunk_hash"] for r in sorted([r for r in out if r["doc_id"] == 1], key=lambda r: r["chunk_idx"])]
    h2 = [r["chunk_hash"] for r in sorted([r for r in out if r["doc_id"] == 2], key=lambda r: r["chunk_idx"])]
    # the tails agree: the longest common hash SUFFIX covers all but the
    # first couple of chunks of each doc (offset-based chunking would
    # shift every boundary and share nothing)
    common = 0
    while (
        common < min(len(h1), len(h2)) and h1[-1 - common] == h2[-1 - common]
    ):
        common += 1
    assert common >= len(h1) - 2 and common >= len(h2) - 2


def test_cdc_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    out = cdc_chunks(df, window=8, mask_bits=4).collect()
    assert len(out) == 1 and out[0]["chunk_text"] == "tiny" and out[0]["chunk_idx"] == 0


# ---------------------------------------------------- streaming parity


def test_cdc_chunks_stream_matches_batch(spark, sf_dir):
    """cdc_chunks is pure map-only expressions — it must run UNCHANGED
    on a readStream input and agree with batch row-for-row."""
    from polars_dataset_spark.sources.tables import load_table
    from polars_dataset_spark.streaming import read_documents_stream, run_stream_to_memory

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("text").isNotNull()) & (F.col("doc_id") % 25 == 0)
    )
    batch = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_hash"])
        for r in cdc_chunks(docs, window=8, mask_bits=5).collect()
    )
    st = read_documents_stream(spark, f"{sf_dir}/documents.parquet").filter(
        (F.col("text").isNotNull()) & (F.col("doc_id") % 25 == 0)
    )
    out = cdc_chunks(st, window=8, mask_bits=5)
    assert out.isStreaming
    run_stream_to_memory(out, "t_cdc_stream", output_mode="append")
    stream = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_hash"])
        for r in spark.sql("select * from t_cdc_stream").collect()
    )
    assert batch == stream


# ------------------------------------------------- randomized properties


def test_cdc_rebuild_random_roundtrip(spark):
    import random

    rng = random.Random(199)
    alpha = "abcdef gh\nij"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 300))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df, window=5, mask_bits=3).collect()
    assert _rebuild(out) == dict(rows)


def test_cms_bound_random(spark):
    import random

    rng = random.Random(196)
    data = [(f"k{rng.randrange(30)}",) for _ in range(3000)]
    df = spark.createDataFrame(data, "v string")
    from collections import Counter

    exact = Counter(v for (v,) in data)
    keys = [f"k{i}" for i in range(30)]
    for depth, width in ((1, 4), (3, 16), (5, 64)):
        est = {
            r["item"]: r["est"]
            for r in cms_estimate(df, "v", keys, depth=depth, width=width).collect()
        }
        for k in keys:
            assert est[k] >= exact.get(k, 0), (depth, width, k)


# --------------------------------------------------------- plan contracts


def test_cdc_plan_is_map_only(spark, sf_dir):
    from polars_dataset_spark.plans import count_exchanges, explain_str
    from polars_dataset_spark import suite

    df = suite.QUERIES["q199_cdc_chunks"](spark, sf_dir)
    assert count_exchanges(df) == 0  # chunking never shuffles
    assert "pythonudf" not in explain_str(df).lower()  # pure codegen


def test_bm25_plan_contracts(spark, sf_dir):
    from polars_dataset_spark.plans import count_joins, explain_str, has_take_ordered
    from polars_dataset_spark import suite

    df = suite.QUERIES["q195_bm25_topk"](spark, sf_dir)
    assert has_take_ordered(df)  # top-k cut, never a global sort
    joins = count_joins(df)
    # df table and corpus totals come back by broadcast; the postings
    # stream is never sort-merge-joined
    assert joins["sort_merge"] == 0
    assert "pythonudf" not in explain_str(df).lower()


def test_sketch_plans_have_no_python(spark, sf_dir):
    from polars_dataset_spark.plans import explain_str
    from polars_dataset_spark import suite

    for q in ("q196_count_min_sketch", "q197_hll_distinct", "q198_numeric_outliers"):
        assert "pythonudf" not in explain_str(suite.QUERIES[q](spark, sf_dir)).lower(), q


def test_bm25_scan_prunes_columns(spark, sf_dir):
    from polars_dataset_spark.plans import read_schema_columns
    from polars_dataset_spark import suite

    df = suite.QUERIES["q195_bm25_topk"](spark, sf_dir)
    # every documents scan in the plan reads only (doc_id, text) — lang,
    # source and n_chars never leave the parquet reader
    for cols in read_schema_columns(df):
        assert set(cols) <= {"doc_id", "text"}, cols


def test_hll_empty_input_estimates_zero(spark):
    df = spark.createDataFrame([], "v string")
    row = hll_summary(df, "v", p=8).collect()[0]
    assert row["nonzero_buckets"] == 0 and row["sum_registers"] == 0
    assert row["harmonic_sum"] == 256.0
    assert row["corrected_estimate"] == 0.0  # linear counting: 256*ln(1)


def test_numeric_outliers_zero_mad_degenerate(spark):
    # constant column + one deviant: MAD = 0, so ANY deviation flags
    # (the standard Hampel degenerate case)
    df = spark.createDataFrame(
        [(i, 5) for i in range(9)] + [(9, 6)], "doc_id long, x long"
    )
    out = {r["doc_id"]: r for r in numeric_outliers(df, "x", c=3.5).collect()}
    assert out[9]["is_outlier"] and out[9]["mad"] == 0.0
    assert not any(out[i]["is_outlier"] for i in range(9))


def test_cms_width_one_returns_total(spark):
    # every value lands in the single cell of each row: est = n for all keys
    df = spark.createDataFrame([(f"v{i}",) for i in range(25)], "v string")
    out = cms_estimate(df, "v", ["v0", "nope"], depth=3, width=1).collect()
    assert all(r["est"] == 25 for r in out)


def test_bm25_rounded_tie_at_k_breaks_by_id(spark):
    # four identical docs tie exactly; k=2 must keep the two lowest ids
    df = spark.createDataFrame(
        [(i, "same text here") for i in (7, 3, 9, 5)], "doc_id long, text string"
    )
    got = [r["doc_id"] for r in bm25_topk(df, "same", k=2).collect()]
    assert sorted(got) == [3, 5]


def test_bm25_randomized_parity_with_python_reference(spark):
    """Random corpora: Spark BM25 == the straight-from-the-formula
    python computation, for every doc, across seeds."""
    import random

    for seed in (11, 23):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30))))
            for i in range(25)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        qterms = ["w0", "w3", "w7"]
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_topk(df, " ".join(qterms), k=25).collect()
        }
        docs = {i: t.split() for i, t in rows}
        n = len(docs)
        avgdl = sum(len(t) for t in docs.values()) / n
        want = {}
        for d, toks in docs.items():
            s = 0.0
            for term in qterms:
                tf = toks.count(term)
                if not tf:
                    continue
                df_t = sum(term in t for t in docs.values())
                idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
            if s:
                want[d] = round(s, 6)
        assert got == want, seed


def test_bm25_many_matches_single(spark, corpus):
    """Per-query results of the batch scorer == the single-query scorer
    (scores AND membership), for queries with disjoint and overlapping
    vocabularies."""
    from polars_dataset_spark.functions import bm25_topk_many

    qs = spark.createDataFrame(
        [(1, "spark joins"), (2, "shuffles"), (3, "nothing tiny")],
        "query_id long, query string",
    )
    many = bm25_topk_many(corpus, qs, k=5)
    rows = many.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    for qid, qtext in ((1, "spark joins"), (2, "shuffles"), (3, "nothing tiny")):
        single = {
            r["doc_id"]: r["score"] for r in bm25_topk(corpus, qtext, k=5).collect()
        }
        assert by_q.get(qid, {}) == single, qid
    # ranks are 1..n per query, ordered by (score desc, id)
    for qid, cs in by_q.items():
        ranked = sorted(
            (r for r in rows if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert [r["rank"] for r in ranked] == list(range(1, len(ranked) + 1))
        assert all(
            (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"])
            for a, b in zip(ranked, ranked[1:])
        )


def test_bm25_many_plan_is_broadcast_only(spark, corpus):
    from polars_dataset_spark.functions import bm25_topk_many
    from polars_dataset_spark.plans import count_joins, explain_str

    qs = spark.createDataFrame([(1, "spark")], "query_id long, query string")
    df = bm25_topk_many(corpus, qs, k=3)
    joins = count_joins(df)
    assert joins["sort_merge"] == 0  # corpus never sort-merge-joins
    text = explain_str(df)
    assert "Exchange SinglePartition" not in text  # window is query-keyed
