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

__all__ = ["bm25_topk", "bm25_topk_many"]


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


def bm25_topk_many(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int = 6,
) -> DataFrame:
    """BM25 top-``k`` per query for a TABLE of queries — the batch shape
    eval-set decontamination and exemplar mining actually run (one
    query at a time re-scans the corpus per query; this scans it ONCE
    for all of them).

    Same scoring as :func:`bm25_topk`. Plan shape:

    - the query table's distinct terms form the pruning vocabulary; it
      is assumed SMALL (an eval set, not a second corpus) and is
      broadcast everywhere it joins;
    - the corpus explodes once, pruned to the union vocabulary, and
      joins the (term -> query) map by broadcast — the intermediate is
      bounded by matching occurrences x queries-per-term;
    - per-(query, doc) scores reduce in one map-side-combined groupBy;
      the top-k cut is a row_number over a window PARTITIONED BY query
      (parallelism = number of queries, never a single partition).

    Returns ``(query_id_col, id_col, score, rank)``.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    qterms = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.explode(F.array_distinct(tokenize(F.col(query_text_col)))).alias("__term"),
    )

    base = docs.select(
        F.col(id_col).alias("__id"),
        tokenize(F.col(text_col)).alias("__toks"),
    ).withColumn("__dl", F.size("__toks"))
    totals = base.agg(F.count("*").alias("__n"), F.sum("__dl").alias("__sumdl"))

    vocab = qterms.select("__term").distinct()
    postings = (
        base.join(
            F.broadcast(vocab.agg(F.collect_set("__term").alias("__vocab"))).hint(
                "broadcast"
            )
        )
        .select(
            "__id",
            "__dl",
            F.explode(
                F.filter(
                    F.col("__toks"),
                    lambda t: F.array_contains(F.col("__vocab"), t),
                )
            ).alias("__term"),
        )
        .groupBy("__id", "__term")
        .agg(F.count("*").alias("__tf"), F.max("__dl").alias("__dl"))
    )
    dfreq = postings.groupBy("__term").agg(F.count("*").alias("__df"))

    scored = (
        postings.join(F.broadcast(qterms), "__term")
        .join(F.broadcast(dfreq), "__term")
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
        .groupBy("__qid", "__id")
        .agg(
            F.round(F.sum(F.col("__idf") * F.col("__norm")), score_round).alias("score")
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.col("score").desc(), F.col("__id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__id").alias(id_col),
            "score",
            "rank",
        )
    )
