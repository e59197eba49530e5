"""Full-text retrieval over the corpus: BM25 scoring and top-k search.

A training-data pipeline needs retrieval constantly — "find the docs
most similar to this benchmark prompt" (contamination triage), "pull
the k best in-domain exemplars for an eval set", "which documents does
this query surface" (corpus QA). The embedding path (similarity.py)
answers it in vector space; this module answers it in LEXICAL space
with BM25 (Robertson & Spärck Jones' Okapi weighting — public; the idf
form is the Lucene ``ln(1 + (N - df + .5)/(df + .5))`` variant, which
is non-negative for any df).

Scale shape (the reason this is not "just a groupBy"):

- the corpus scan keeps ONLY postings matching the query's terms
  (``F.filter`` against a literal term array before the explode, so
  every occurrence still counts toward tf) — the exploded stream is
  bounded by matching occurrences, not corpus token count;
- document frequencies and corpus totals are tiny aggregates
  (|query| rows and 1 row) joined back by BROADCAST — no second
  corpus-scale shuffle;
- per-doc scores reduce in ONE map-side-combined groupBy(doc); top-k
  is a TakeOrdered (no global sort).

Determinism: the top-k cut orders by ``round(score, 6) DESC, id ASC``
— last-ulp ``ln`` differences between engines cannot flip a rounded
digit, and the id tiebreak pins the k boundary, so the result replays
exactly in ANSI SQL (q195's oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_dataset_spark.functions.text import tokenize

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int = 6,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25.

    Tokenization is the engine's whitespace tokenizer (lowercased,
    :func:`~polars_dataset_spark.functions.text.tokenize`); ``N`` is
    the full corpus row count and ``avgdl`` the mean token count with
    empty documents counting 0. Returns the top-k ``(id_col, score)``
    rows with ``score`` rounded to ``score_round``; ties at the k
    boundary break by id.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    terms = sorted(set(query.lower().split()))
    if not terms:
        raise ValueError("query has no tokens")
    term_lits = F.array(*[F.lit(t) for t in terms])

    base = docs.select(
        F.col(id_col).alias("__id"),
        tokenize(F.col(text_col)).alias("__toks"),
    ).withColumn("__dl", F.size("__toks"))

    # corpus totals: ONE row, broadcast-cross-joined into the scorer
    totals = base.agg(
        F.count("*").alias("__n"), F.sum("__dl").alias("__sumdl")
    )

    # postings restricted to query terms BEFORE the explode: the shuffle
    # holds only (matching doc, query term) pairs
    postings = (
        base.select(
            "__id",
            "__dl",
            # tf needs every occurrence, so filter (not intersect) the
            # token array down to query terms before the explode
            F.explode(
                F.filter(F.col("__toks"), lambda t: F.array_contains(term_lits, t))
            ).alias("__term"),
        )
        .groupBy("__id", "__term")
        .agg(F.count("*").alias("__tf"), F.max("__dl").alias("__dl"))
    )

    dfreq = postings.groupBy("__term").agg(F.count("*").alias("__df"))

    scored = (
        postings.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__norm",
            F.col("__tf")
            * (F.lit(k1) + 1.0)
            / (
                F.col("__tf")
                + F.lit(k1)
                * (
                    F.lit(1.0)
                    - F.lit(b)
                    + F.lit(b)
                    * F.col("__dl")
                    / (F.col("__sumdl").cast("double") / F.col("__n"))
                )
            ),
        )
        .groupBy("__id")
        .agg(F.round(F.sum(F.col("__idf") * F.col("__norm")), score_round).alias("score"))
    )
    # orderBy + limit plans as TakeOrderedAndProject — no global sort, no
    # single-partition exchange; rank is NOT materialized (a global
    # row_number window would add one) — (score DESC, id ASC) on the
    # returned rows IS the ranking
    return (
        scored.orderBy(F.col("score").desc(), F.col("__id").asc())
        .limit(k)
        .select(F.col("__id").alias(id_col), "score")
    )
