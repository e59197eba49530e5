"""Corpus-preparation operators a large-scale LLM training pipeline needs
beyond cleaning/dedup (driver north-star, SURVEY §2.4): context-window
chunking, vocabulary building + OOV accounting, unigram-surprisal scoring,
PII redaction, and tf-idf term extraction.

Scale design (100 TB framing):
- Chunking and redaction are map-only codegen'd expressions — no shuffle.
- Vocabulary / surprisal / tf-idf need corpus-global statistics; each is
  ONE hash aggregation keyed on the token (never a global window).
  Scalar totals (token count, doc count) are single bounded ``count()``
  actions folded back in as literals — one number to the driver, and no
  constant-key join (which Catalyst constant-folds into a nested loop).
- Float policy: anything summed across rows is rounded per-row and summed
  as DECIMAL so results are reproducible under any partitioning and
  engine (see ROUND1_NOTES float policy; log/exp outputs are rounded to 7
  before the exact sum, final statistics to 4-6).

Reference scope note: the reference engine (polars_dataset.py) has no
corpus machinery; these operators are the §2.4 "training-data pipeline"
surface the build brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_dataset_spark.functions.text import tokenize

__all__ = [
    "chunk_documents",
    "dedup_chunks",
    "build_vocab",
    "with_oov_rate",
    "with_surprisal",
    "with_bigram_surprisal",
    "redact_pii",
    "tfidf_top_terms",
    "EMAIL_RE",
    "IPV4_RE",
    "PHONE_RE",
]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document's whitespace tokens into overlapping context
    windows: chunk ``i`` covers tokens ``[i·stride, i·stride+max_tokens)``
    with ``stride = max_tokens - overlap``; the last chunk is the first
    one whose window reaches the end of the document. Every document
    yields at least one chunk (empty text → one empty chunk).

    Output: ``(id_col, chunk_idx, chunk_text, n_tokens)``. Map-only
    (tokenize → explode over a per-row ``sequence``); no shuffle, so it
    runs at scan speed at any scale."""
    # int-coerce before interpolating into the expr below — a non-int
    # would either TypeError here or be rejected, never reach the SQL text
    max_tokens, overlap = int(max_tokens), int(overlap)
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    stride = max_tokens - overlap
    base = (
        df.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .withColumn(
            "__nc",
            F.when(F.col("__n") <= max_tokens, F.lit(1)).otherwise(
                F.expr(f"(__n - {max_tokens} + {stride} - 1) div {stride} + 1").cast("int")
            ),
        )
    )
    exploded = base.select(
        F.col(id_col),
        "__toks",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_idx"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, max_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def dedup_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    text_col: str = "chunk_text",
) -> DataFrame:
    """Chunk-level exact dedup (the C4/RefinedWeb passage-dedup step):
    keep the first occurrence — minimal ``(id, chunk_idx)`` — of every
    distinct chunk text. One hash-partitioned window on the text key."""
    w = Window.partitionBy(text_col).orderBy(F.col(id_col), F.col(idx_col))
    return (
        chunks.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def build_vocab(
    df: DataFrame, text_col: str = "text", top_v: int = 1000
) -> DataFrame:
    """Top-``top_v`` tokens by corpus frequency → ``(token, cnt)``.
    Ties break lexicographically, so the vocabulary is deterministic on
    any engine. One hash aggregation + a distributed TakeOrdered (no
    global sort materialization)."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(top_v)
    )


def with_oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary accounting against ``vocab``
    (a ``token`` column, e.g. from :func:`build_vocab`):
    ``(id_col, n_tokens, n_oov, oov_frac)``. Documents with no tokens are
    absent (no instances to account). The vocabulary is broadcast — it is
    top-V by construction — so the probe side never shuffles."""
    tok = df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token"))
    marked = tok.join(
        F.broadcast(vocab.select("token").withColumn("__in", F.lit(1))),
        on="token",
        how="left",
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("oov_frac"),
    )


def with_surprisal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram-LM surprisal per document — the classic cheap "perplexity"
    quality signal: mean over token instances of ``-log2 p(token)`` with
    ``p`` the corpus unigram distribution. High values ≈ rare/garbled
    text, low ≈ repetitive boilerplate.

    Shape: one token-keyed aggregation for the frequency table, one join
    back to instances (token-keyed shuffle), one per-doc aggregation.
    The corpus token total is a single bounded ``count()`` action (one
    scalar to the driver — a constant-key join would plan as a nested
    loop after constant folding). Per-token bits are rounded to 7 and
    summed as DECIMAL — the mean is independent of partitioning and
    engine. Returns ``(id_col, n_tokens, surprisal_bits)``; token-less
    docs are absent."""
    tok = df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token"))
    total = tok.count()  # Σ_t cnt_t ≡ number of token instances
    freq = tok.groupBy("token").agg(F.count("*").alias("__cnt"))
    bits = F.round(F.log2(F.lit(total) / F.col("__cnt")), 7).cast("decimal(20,7)")
    scored = tok.join(freq.withColumn("__bits", bits), on="token")
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(
            (F.sum("__bits").cast("double") / F.count("*")), 4
        ).alias("surprisal_bits"),
    )


def with_bigram_surprisal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: float = 0.5
) -> DataFrame:
    """Bigram-LM surprisal per document — one order up from
    :func:`with_surprisal`'s unigram signal, catching locally-fluent
    word SEQUENCES (the unigram model scores shuffled text identically;
    this one doesn't): mean over bigram instances of
    ``-log2 p(w2|w1)`` with add-k smoothing,
    ``p(w2|w1) = (c(w1,w2)+k) / (c(w1)+k·V)``, V the corpus vocabulary
    size.

    Shape: token positions via ``posexplode`` + one per-doc lag window
    (doc-sized partitions), two keyed aggregations (bigram and unigram
    counts), joins back to instances, one per-doc aggregation. V is a
    single bounded scalar action. Per-bigram bits round to 7 and sum as
    DECIMAL, so the mean is partitioning- and engine-independent.
    Returns ``(id_col, n_bigrams, bigram_surprisal_bits)``; docs with
    fewer than two tokens are absent."""
    tok = df.select(
        F.col(id_col), F.posexplode(tokenize(F.col(text_col))).alias("pos", "token")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    big = tok.withColumn("prev", F.lag("token").over(w)).filter(
        F.col("prev").isNotNull()
    )
    # localCheckpoint: the V scalar AND the instance join both consume the
    # unigram table; without it the token-keyed aggregation (a full shuffle
    # of every token instance) executes twice. Checkpointed size is the
    # vocabulary — Heaps'-law sublinear in the corpus, never instance-scale.
    from polars_dataset_spark.session import pin

    uni = pin(tok.groupBy("token").agg(F.count("*").alias("c1")), eager=True)
    vocab_size = uni.count()  # scalar: |vocabulary|
    bi = big.groupBy("prev", "token").agg(F.count("*").alias("cb"))
    bits = F.round(
        F.log2(
            (F.col("c1") + F.lit(k) * F.lit(vocab_size)) / (F.col("cb") + F.lit(k))
        ),
        7,
    ).cast("decimal(20,7)")
    scored = (
        big.join(bi, on=["prev", "token"])
        .join(uni.withColumnRenamed("token", "prev"), on="prev")
        .withColumn("__bits", bits)
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round((F.sum("__bits").cast("double") / F.count("*")), 4).alias(
            "bigram_surprisal_bits"
        ),
    )


# RE2-compatible (and Java-regex-compatible) patterns: no backreferences,
# no lookaround — the identical strings run in Spark, DuckDB, and any
# engine an oracle replays on.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Lightweight regex PII scrub (the q96 contract): emails →
    ``<EMAIL>``, IPv4 → ``<IP>``, short phone forms → ``<PHONE>``,
    applied in that order (emails first so an address's digits can't
    half-match the later patterns). Match counts (``n_emails, n_ips,
    n_phones``) are taken on the ORIGINAL text. Pure map-only
    codegen'd expressions — scan-speed at any scale.

    For production scrubbing prefer :mod:`functions.pii`
    (``scrub_pii``/``with_pii_counts``, r11): five families with
    octet-guarded IPv4, SSN invalid-prefix exclusion, card shapes,
    international phones, and sequential attribution counts. This
    simpler form is kept for the q96 oracle contract and as the
    cheap screen when only the three classic families matter."""
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return df.withColumns(
        {
            out_col: red,
            "n_emails": F.regexp_count(t, F.lit(EMAIL_RE)),
            "n_ips": F.regexp_count(t, F.lit(IPV4_RE)),
            "n_phones": F.regexp_count(t, F.lit(PHONE_RE)),
        }
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf.

    Ranking is fully INTEGER-deterministic — ``tf`` desc, document
    frequency asc, token asc — so it replays identically on any engine;
    the float ``tfidf = tf·ln(N/df_t)`` (rounded to 6) is carried as a
    value column but never decides order. Plan: per-(doc, token) counts
    (one shuffle), token-keyed doc-frequency aggregation (second, on the
    already-distinct pairs), join back on token, per-doc top-k window —
    each stage keyed and partition-parallel. ``N`` (docs with ≥1 token)
    is one map-only bounded ``count()`` action — no shuffle, and no
    constant-key join that would fold into a nested loop."""
    tok = df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token"))
    ndocs = df.filter(F.size(tokenize(F.col(text_col))) > 0).count()
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df_t"))
    joined = tf.join(dfreq, on="token").withColumn("__n", F.lit(ndocs))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df_t").asc(), F.col("token").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("token"),
            F.col("tf"),
            F.col("df_t"),
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df_t")), 6).alias("tfidf"),
            F.col("rank"),
        )
    )


def kl_divergence_by(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distribution-shift diagnostic for data mixing: KL(group ‖ corpus)
    over the unigram token distribution, per group — how far each
    source's language drifts from the blended corpus. Tokens absent
    from a group contribute 0 (the p→0 limit), and every group token
    exists in the corpus by construction, so the divergence is always
    finite. Three hash aggregations (corpus counts, group counts, final
    sum) — the per-token frames are vocabulary-sized, not corpus-sized,
    after the first aggregation."""
    toks = df.select(
        F.col(group_col), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    corpus = toks.groupBy("token").agg(F.count("*").alias("__c"))
    tot = corpus.agg(F.sum("__c").alias("__tot"))
    grp = toks.groupBy(group_col, "token").agg(F.count("*").alias("__s"))
    gtot = grp.groupBy(group_col).agg(F.sum("__s").alias("__gt"))
    joined = (
        grp.join(corpus, "token")
        .join(F.broadcast(gtot), group_col)
        .crossJoin(F.broadcast(tot))
    )
    p_s = F.col("__s") / F.col("__gt")
    p_c = F.col("__c") / F.col("__tot")
    return (
        joined.groupBy(group_col)
        .agg(
            F.sum(p_s * F.log(p_s / p_c)).alias("kl"),
            F.first("__gt").alias("n_tokens"),
        )
    )
