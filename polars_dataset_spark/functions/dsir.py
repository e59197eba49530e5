"""Data Selection with Importance Resampling (DSIR) over hashed n-grams.

The published recipe (Xie et al., "Data Selection for Language Models
via Importance Resampling", NeurIPS 2023 — public paper): featurize
every document as a bag of HASHED unigrams+bigrams, fit two smoothed
multinomial bag-of-buckets models — one on a small *target* corpus (the
distribution you want more of), one on the *raw* pool — and weight each
raw document by its log likelihood ratio under the two models. Top
weights (or Gumbel-perturbed weights, for proper importance
*resampling*) pick the training subset that looks most like the target.

Spark shape (100-TB design):

- featurize: map-only explode of ``2·len−1`` grams per doc, bucketed by
  the package's engine-portable 60-bit md5 hash modulo ``buckets`` —
  no vocabulary, no driver state, no join against a token table;
- one ``(id, bucket)``-keyed aggregation (the only instance-scale
  shuffle, with map-side combine) yields per-doc feature counts;
- bucket marginals are a second aggregation DOWN to ``≤ buckets`` rows
  (map-side combine makes this near-free), and the two corpus totals
  are one bounded single-row collect;
- the ``buckets``-row log-ratio table is **broadcast** back onto the
  per-doc features — never a shuffle of the corpus side.

Engine-portability (the suite's oracle contract): per-bucket log ratios
round to 7 decimals and accumulate as DECIMAL, so per-doc sums are
exact and independent of partitioning; the bucket hash is the shared
``md5 → first 15 hex digits`` form DuckDB restates verbatim.

Reference parity note: the reference engine (C++/Rust core,
``/root/reference/polars_dataset.py``) has no data-selection surface;
this module is part of the repo's LLM-training-data extension family
(SURVEY.md "beyond the reference" mandate), same tier as
functions/dedup.py and functions/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_dataset_spark.functions.text import tokenize

__all__ = ["hashed_gram_features", "dsir_score", "dsir_resample"]


def _grams(text_col: str) -> Column:
    """Unigrams + space-joined bigrams of the canonical whitespace
    tokenization — ``2·len(toks) − 1`` grams per non-empty doc."""
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _bucket_of(gram: Column, buckets: int, salt: str) -> Column:
    """Engine-portable bucket id: first 15 hex digits of
    ``md5(salt || gram)`` as a 60-bit long, modulo ``buckets``
    (non-negative on both engines). DuckDB restatement:
    ``('0x' || substr(md5(salt || gram), 1, 15))::BIGINT % buckets``."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), gram)), 1, 15), 16, 10)
    return (h.cast("long") % F.lit(buckets)).alias("bucket")


def hashed_gram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    salt: str = "",
    carry_cols: "list[str] | None" = None,
) -> DataFrame:
    """Per-document hashed bag-of-grams: ``(id_col, *carry_cols, bucket,
    cnt)`` with one row per (doc, bucket) that has at least one gram.
    Docs with no tokens are absent (same contract as
    :func:`~polars_dataset_spark.functions.corpus.with_surprisal`).

    ``carry_cols`` rides doc-level columns through the explode so later
    stages need no join back to the corpus (they are functionally
    dependent on ``id_col``)."""
    carry = list(carry_cols or [])
    exploded = df.select(
        F.col(id_col), *[F.col(c) for c in carry], F.explode(_grams(text_col)).alias("__gram")
    )
    return exploded.groupBy(
        id_col, *carry, _bucket_of(F.col("__gram"), buckets, salt)
    ).agg(F.count("*").alias("cnt"))


def dsir_score(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """DSIR importance weights for every document in ``df``.

    ``target`` is a boolean Column over ``df``'s rows marking the
    target-distribution subset (e.g. ``F.col("lang") == "en"``, or a
    quality flag); the raw model is fit on ALL of ``df``. Returns
    ``(id_col, is_target, n_grams, dsir_logw, dsir_logw_per_gram)``:

    - ``n_grams``  — gram instances in the doc (``2·len−1``), exact;
    - ``dsir_logw`` — ``Σ_b c_db · [ln p̂_tgt(b) − ln p̂_raw(b)]`` with
      add-``alpha`` smoothing over ``buckets`` cells, rounded to 4;
    - ``dsir_logw_per_gram`` — the length-normalized variant (the sum
      divided by ``n_grams``), rounded to 4 — use this for selection
      unless you *want* long docs favored.

    Per-bucket log ratios are rounded to 7 decimals and summed as
    DECIMAL, making both outputs partition- and engine-exact.

    Plan shape: the per-doc feature table is a LAZY localCheckpoint, so
    the explode→aggregate chain (the instance-scale work) runs ONCE and
    both consumers — the bucket marginals and the per-doc scoring —
    read the materialization; the two corpus totals ride a broadcast
    single-row cross join instead of a separate collect action, so the
    whole score is one job. The ratio table (≤ ``buckets`` rows) is
    broadcast."""
    from polars_dataset_spark.session import pin

    feats = pin(
        hashed_gram_features(
            df.withColumn("__is_target", target.cast("boolean")),
            id_col,
            text_col,
            buckets,
            salt,
            carry_cols=["__is_target"],
        )
    )
    marg = feats.groupBy("bucket").agg(
        F.sum("cnt").alias("r_b"),
        F.sum(F.when(F.col("__is_target"), F.col("cnt")).otherwise(F.lit(0))).alias(
            "t_b"
        ),
    )
    totals = marg.agg(
        F.sum("r_b").cast("double").alias("__R"),
        F.sum("t_b").cast("double").alias("__T"),
    )
    denom_t = F.col("__T") + F.lit(float(alpha * buckets))
    denom_r = F.col("__R") + F.lit(float(alpha * buckets))
    lr = F.round(
        F.log((F.col("t_b") + F.lit(alpha)) / denom_t)
        - F.log((F.col("r_b") + F.lit(alpha)) / denom_r),
        7,
    ).cast("decimal(20,7)")
    ratios = marg.crossJoin(F.broadcast(totals)).select("bucket", lr.alias("__lr"))
    # decimal(10,0) × decimal(20,7) → decimal(31,7): inside Spark's
    # 38-digit ceiling, so the product keeps scale 7 EXACTLY. (An
    # (18,0) factor would make the product (39,7) → Spark silently
    # drops to scale 6 with rounding — a systematic cross-engine
    # mismatch, found by the q175 oracle.)
    contrib = (F.col("cnt").cast("decimal(10,0)") * F.col("__lr")).alias("__c")
    scored = feats.join(F.broadcast(ratios), on="bucket").select(
        id_col, "__is_target", "cnt", contrib
    )
    # Round the exact DECIMAL sum BEFORE any double cast: a 7-decimal
    # sum lands on an exact .xxxx5 half-boundary ~1/1000 of the time,
    # where double-rounding (Java shortest-repr HALF_UP vs DuckDB's
    # ·1e4 trick) disagrees — decimal rounding is exact half-away on
    # both engines. The per-gram MEAN is likewise rounded integrally:
    # floor((2S+1000n)/(2000n)) over the exact 1e-7-unit sum — the r9
    # sf10 sweep found 1 row in 500k whose double quotient's SHORTEST
    # representation sat on the 4-dp 5-boundary, splitting Spark's
    # shortest-decimal round from DuckDB's exact-binary round even with
    # bit-identical inputs (the subtraction-of-pmod quotient is exactly
    # divisible, so the decimal division below is exact; half-up toward
    # +inf on both engines).
    s7 = (F.sum("__c") * F.lit(10_000_000)).cast("decimal(38,0)")
    ngr = F.sum("cnt").cast("decimal(38,0)")
    a = s7 * 2 + ngr * 1000
    b = ngr * 2000
    return scored.groupBy(id_col).agg(
        F.first("__is_target").alias("is_target"),
        F.sum("cnt").alias("n_grams"),
        F.round(F.sum("__c"), 4).cast("double").alias("dsir_logw"),
        (((a - F.pmod(a, b)) / b).cast("double") / F.lit(10000.0)).alias(
            "dsir_logw_per_gram"
        ),
    )


def dsir_resample(
    df: DataFrame,
    target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
    temperature: "float | None" = 1.0,
    salt: str = "",
    gumbel_salt: str = "gumbel",
) -> DataFrame:
    """Pick ``k`` documents by DSIR weight.

    ``temperature=None`` → deterministic top-k by
    ``dsir_logw_per_gram`` (ties broken by ``id_col``).
    Otherwise Gumbel-top-k importance *resampling* (the paper's
    sampling-without-replacement trick): score =
    ``dsir_logw_per_gram / temperature + Gumbel(0,1)`` with the Gumbel
    noise derived from the deterministic portable hash
    (``u = (h+1)/(2^60+1)``, ``g = −ln(−ln u)``) — reproducible across
    runs, engines, and cluster sizes, no RNG state.

    Plan shape: the scoring pipeline above + one global
    ``TakeOrderedAndProject`` (no full sort; each partition keeps k)."""
    scored = dsir_score(df, target, id_col, text_col, buckets, alpha, salt)
    key = F.col("dsir_logw_per_gram")
    if temperature is not None:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(gumbel_salt), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        u = (h + F.lit(1.0)) / F.lit(float(2**60) + 1.0)
        key = key / F.lit(float(temperature)) - F.log(-F.log(u))
    return (
        scored.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col))
        .limit(k)
        .drop("__key")
    )
