"""Deduplication operators for training-data pipelines (SURVEY §2.4).

Five families, each with the candidate-generation / exact-verify split that
survives 100 TB:

- :func:`exact_dedup` — hash group-by on (normalized) content. One shuffle.
- MinHash + LSH — :func:`minhash_signatures` (JVM-side, no UDF: shingles →
  ``xxhash64`` per seed → ``array_min``), banded into buckets
  (:func:`minhash_lsh_candidates`); candidate pairs are verified with the
  EXACT Jaccard on shingle sets before anything is dropped. Pair blow-up is
  bounded by bucket size, never |docs|².
- SimHash — :func:`simhash` (token hashes JVM-side, the 64-bit sign-sum in
  one Arrow-batched pandas UDF); near-duplicates found by Hamming-band
  blocking + exact ``bit_count(xor)`` verify.
- n-gram Jaccard — character-shingle variant of the MinHash path.
- :func:`embedding_neardup` — cosine near-dup over an embedding column via
  random-hyperplane LSH buckets + exact cosine verify.

Representative selection everywhere is "keep the smallest id among
near-duplicates": any row with a confirmed duplicate of smaller id drops.
This is the standard single-pass LSH-dedup contract (transitive chains
collapse toward the minimum per *connected bucket*, not full connected
components — full CC is an iterative algorithm out of scope for one pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_dataset_spark.functions.text import tokenize
from polars_dataset_spark.session import pin


def _swap_cache(result: DataFrame, intermediate: DataFrame) -> DataFrame:
    """Move the cache from a big intermediate onto the (small) result:
    persist + materialize the result, then free the intermediate's blocks.
    Without this, every LSH call in a long-lived session leaks an
    input-sized cache entry (signatures/shingles) for the session
    lifetime; after the swap only an output-sized entry remains, and the
    ContextCleaner drops it once the caller releases the frame."""
    result = result.persist()
    result.count()
    intermediate.unpersist(blocking=False)
    return result

__all__ = [
    "exact_dedup",
    "token_shingles",
    "shingles_from_tokens",
    "char_shingles",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_dedup",
    "simhash",
    "simhash_dedup",
    "simhash_dedup_portable",
    "ngram_jaccard_pairs",
    "embedding_neardup",
    "build_neardup_index",
    "neardup_filter_against",
    "remove_repeated_substrings",
    "dedup_lines",
    "drop_frequent_lines",
    "edit_distance_join",
    "cdc_chunks",
    "append_to_banded_index",
]


def exact_dedup(
    df: DataFrame,
    subset: list[str] | str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup: one representative (minimal ``id_col``) per distinct
    content. Single hash aggregation — the cheapest possible dedup, always
    run it before any fuzzy pass. ``normalize`` lowercases and collapses
    whitespace for string keys."""
    subset = [subset] if isinstance(subset, str) else list(subset)
    keys = [
        F.regexp_replace(F.trim(F.lower(F.col(c))), r"\s+", " ").alias(f"__k_{c}")
        if normalize and df.schema[c].dataType.simpleString() == "string"
        else F.col(c).alias(f"__k_{c}")
        for c in subset
    ]
    keyed = df.select(*df.columns, *keys)
    w = Window.partitionBy(*[f"__k_{c}" for c in subset]).orderBy(F.col(id_col).asc())
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", *[f"__k_{c}" for c in subset])
    )


def shingles_from_tokens(tokens, n: int = 3):
    """Distinct word n-grams of a token ARRAY column → array<string>.

    Pass a materialized array COLUMN (``withColumn`` the tokens first),
    not a raw expression: interpreted higher-order lambdas re-evaluate
    every expression tree they reference once per element, so an inline
    ``tokenize(text)`` here costs an O(n) regex split per gram — O(n²)
    per document (measured 4× on decontamination)."""
    # NB: F.sequence(1, 0) yields a DESCENDING [1, 0] — guard short docs
    # explicitly instead of relying on an empty sequence.
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    whole = F.array(F.concat_ws(" ", tokens))
    return F.array_distinct(F.when(F.size(tokens) >= n, grams).otherwise(whole))


def token_shingles(text, n: int = 3):
    """Distinct word n-grams of lowercased text → array<string>. Documents
    shorter than n tokens fall back to the whole text as one shingle (so
    short docs still dedup against identical short docs).

    Convenience single-expression form; hot paths should materialize the
    token array and use :func:`shingles_from_tokens` (see its warning)."""
    return shingles_from_tokens(tokenize(text), n)


def char_shingles(text, n: int = 5):
    """Distinct character n-grams of normalized text → array<string>."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(norm) - (n - 1)),
        lambda i: F.substring(norm, i, n),
    )
    return F.array_distinct(F.when(F.length(norm) >= n, grams).otherwise(F.array(norm)))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_size: int = 3,
    shingle_kind: str = "token",
    shingles_col: str = "shingles",
    sig_col: str = "minhash",
    impl: str = "vectorized",
    seed: int = 42,
) -> DataFrame:
    """Attach shingle set + MinHash signature (array<long>).

    ``impl="vectorized"`` (default): ONE ``xxhash64`` per shingle JVM-side,
    then the ``num_hashes`` signature lanes are derived as affine re-mixes
    ``h_j = a_j·h + b_j (mod 2^64)`` with odd seeded multipliers, min'd per
    lane in a single Arrow-batched numpy op — the standard one-strong-hash
    + universal-family construction, ~10× faster than ``impl="expr"``
    (``num_hashes`` separate interpreted ``transform`` passes) with the
    same collision statistics. Map-only either way; shuffles only appear
    downstream in the band join.
    """
    if impl == "expr":
        sh = (token_shingles if shingle_kind == "token" else char_shingles)(
            F.col(text_col), shingle_size
        )
        tmp = df.withColumn(shingles_col, sh)

        def hasher(j: int):
            # NB: a bound default (lambda s, j=j: ...) would make the lambda
            # 2-ary, and pyspark's `transform` passes the ARRAY INDEX as the
            # second argument — silently shadowing the seed. Keep it 1-ary.
            return lambda s: F.xxhash64(s, F.lit(j))

        sig = F.array(
            *[
                F.array_min(F.transform(F.col(shingles_col), hasher(j)))
                for j in range(num_hashes)
            ]
        )
        return tmp.withColumn(sig_col, sig)

    from polars_dataset_spark.session import ensure_parallelism

    df = ensure_parallelism(df)  # shingle+sign is the heavy map stage
    rng = np.random.RandomState(seed)
    mult = (rng.randint(1, 2**63, size=num_hashes).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    add = rng.randint(0, 2**63, size=num_hashes).astype(np.uint64)
    is_token = shingle_kind == "token"
    n = shingle_size

    out_type = T.StructType(
        [
            T.StructField("shingles", T.ArrayType(T.StringType())),
            T.StructField("minhash", T.ArrayType(T.LongType())),
        ]
    )

    @F.pandas_udf(out_type)
    def shingle_and_sign(texts: pd.Series) -> pd.DataFrame:
        # Shingling + hashing done wholly Arrow-side: Spark's higher-order
        # functions (transform/slice/concat_ws) are interpreted per
        # element, and profiling shows the JVM expr path spends most of
        # its time THERE, not in hashing. The whole batch is processed
        # FLAT (one hash call, one mix, one segmented min) rather than
        # per-doc: pandas' vectorized 64-bit string hash over the
        # flattened shingle list, dedup to unique hashes (corpora repeat
        # shingles heavily — ~10× here), affine-mix only the unique
        # values in lane-major layout, gather, and `minimum.reduceat`
        # over doc boundaries. ~6× over the per-doc loop it replaces.
        import re

        ws = re.compile(r"\s+")
        sh_out = []
        for s in texts:
            norm = ws.sub(" ", (s or "").strip().lower())
            if is_token:
                toks = norm.split(" ") if norm else [""]
                if len(toks) >= n:
                    shingles = list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
                else:
                    shingles = [" ".join(toks)]
            else:
                if len(norm) >= n:
                    shingles = list({norm[i : i + n] for i in range(len(norm) - n + 1)})
                else:
                    shingles = [norm]
            sh_out.append(shingles)
        if not sh_out:
            return pd.DataFrame({"shingles": [], "minhash": []})
        # every doc yields >=1 shingle (empty text -> [""]) so reduceat
        # segments are never empty
        lens = np.fromiter(map(len, sh_out), dtype=np.int64, count=len(sh_out))
        flat = np.concatenate([np.asarray(sh, dtype=object) for sh in sh_out])
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        hashed = pd.util.hash_array(flat, hash_key="0123456789abcdef")
        uniq, inv = np.unique(hashed, return_inverse=True)
        with np.errstate(over="ignore"):
            mixed_u = mult[:, None] * uniq[None, :] + add[:, None]
        sigs = np.minimum.reduceat(mixed_u[:, inv], starts, axis=1).T
        mh_out = list(np.ascontiguousarray(sigs).view(np.int64))
        return pd.DataFrame({"shingles": sh_out, "minhash": mh_out})

    packed = df.withColumn("__sm", shingle_and_sign(F.col(text_col)))
    return packed.withColumns(
        {shingles_col: F.col("__sm.shingles"), sig_col: F.col("__sm.minhash")}
    ).drop("__sm")


def _band_keys(
    sigd: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """Explode a signature frame into LSH bucket keys ``(id, band, bh)``:
    each band of ``num_hashes/bands`` signature lanes hashes to one
    64-bit bucket key. Shared by the self-join (minhash_lsh_candidates),
    the cross-join (fuzzy_join) and the static-index (neardup) variants
    so all three land identical texts in identical buckets."""
    rows = num_hashes // bands
    return sigd.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("minhash")[i]
                                for i in range(b * rows, (b + 1) * rows)
                            ]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bh")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    shingle_kind: str = "token",
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact ``jaccard``) via banded
    MinHash LSH.

    Banding: ``num_hashes`` minhashes → ``bands`` buckets of
    ``num_hashes/bands`` rows each; two docs collide if any band matches
    exactly (P[collide] = 1-(1-j^r)^b). Collisions are grouped per
    (band_id, band_hash) — the self-join is on the bucket key, so shuffle
    volume is |docs|·bands, never |docs|². Every candidate is then verified
    with the exact Jaccard over the true shingle sets; only pairs ≥
    ``threshold`` survive."""
    sigd = minhash_signatures(
        df.select(id_col, text_col),
        text_col,
        num_hashes=num_hashes,
        shingle_size=shingle_size,
        shingle_kind=shingle_kind,
    ).persist()  # referenced twice below (banding + verify): pay the
    # shingle/signature pass once; MEMORY_AND_DISK default spills safely
    # Band rows carry ONLY (id, band, band_hash): shuffling the shingle
    # arrays 16× through the self-join would dominate the whole operator —
    # instead the (small) candidate pair set joins back to one copy of the
    # shingle sets for the exact verify.
    banded = _band_keys(sigd, id_col, num_hashes, bands)

    a = banded.select(F.col(id_col).alias("id_a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bh")
    pairs = (
        a.join(b, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    shingle_sets = sigd.select(F.col(id_col), F.col("shingles"))
    pairs = (
        pairs.join(
            shingle_sets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")),
            on="id_a",
        ).join(
            shingle_sets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")),
            on="id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    verified = (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
    # near-dup pairs are small by contract — cache those, free the
    # input-sized signature/shingle cache
    return _swap_cache(verified, sigd)


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """Drop every row with a confirmed near-duplicate of smaller id."""
    pairs = minhash_lsh_candidates(
        df, id_col=id_col, text_col=text_col, threshold=threshold, **lsh_kwargs
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash_dedup_portable(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup removal with an ENGINE-PORTABLE hash: token bits
    come from the md5 hex digest (every engine agrees on md5), extracted
    per-nibble with substring + strpos arithmetic — so an external SQL
    engine can replay the exact same simhashes, pair set, and survivor
    set, value-for-value.

    Construction (classic Charikar, tf-weighted): explode tokens →
    per-(doc, token) counts → 64 codegen'd ± vote sums → the 64 sign bits
    packed into ``max_hamming + 1`` SMALL integer chunks (16-bit here, so
    no 64-bit overflow anywhere under ANSI mode). Candidates must agree
    on ≥1 chunk (pigeonhole — recall is EXACTLY 1 for hamming ≤ k, not
    probabilistic), verified with ``bit_count(xor)`` over the chunks.
    Same two-shuffle + band-join scale shape as :func:`simhash_dedup`;
    the fast path hashes Arrow-side instead and stays rows-only."""
    from polars_dataset_spark.session import ensure_parallelism

    chunks = max_hamming + 1
    if 64 % chunks:
        raise ValueError("max_hamming + 1 must divide 64")
    width = 64 // chunks
    if width > 30:
        raise ValueError("chunk width must fit an int: max_hamming >= 2 required")

    df = ensure_parallelism(df)

    # The whole signature — tokenize, md5 per UNIQUE token, 64 tf-weighted
    # vote sums, sign-bit chunk packing — is ONE map-only Arrow batch
    # (earlier revisions tried explode + 64 codegen'd sums: correct, but
    # Catalyst analysis + janino compile of the 64-expression aggregate
    # cost ~10 s per cold plan, dwarfing the data). Bit semantics are the
    # oracle's exactly: bytes of the UTF-8 md5 digest, big-endian,
    # MSB-first (== the per-hex-nibble rule the SQL states); tokens =
    # ASCII-\s+ split of space-trimmed lower text, with a '' token for
    # empty docs (DuckDB string_split parity). Python touches each unique
    # token once per batch; votes are numpy (unpackbits + reduceat).
    out_type = T.StructType(
        [T.StructField(f"ch{k}", T.IntegerType()) for k in range(chunks)]
    )

    @F.pandas_udf(out_type)
    def simhash_chunks(texts: pd.Series) -> pd.DataFrame:
        import hashlib
        import re

        ws = re.compile(r"\s+", re.ASCII)
        toks_per_doc = []
        for s in texts:
            norm = ws.sub(" ", (s or "").strip(" ").lower())
            toks_per_doc.append(norm.split(" ") if norm else [""])
        if not toks_per_doc:
            return pd.DataFrame(
                {f"ch{k}": pd.array([], dtype="int32") for k in range(chunks)}
            )
        lens = np.fromiter(map(len, toks_per_doc), dtype=np.int64, count=len(toks_per_doc))
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks_per_doc])
        uniq, inv = np.unique(flat, return_inverse=True)
        digests = np.empty((len(uniq), 8), dtype=np.uint8)
        for i, t in enumerate(uniq):
            digests[i] = np.frombuffer(
                hashlib.md5(t.encode()).digest()[:8], dtype=np.uint8
            )
        signs = np.unpackbits(digests, axis=1).astype(np.int32) * 2 - 1  # (uniq, 64)
        votes = np.add.reduceat(signs[inv], starts, axis=0)  # (docs, 64)
        pos = votes > 0
        out = {}
        for k in range(chunks):
            val = np.zeros(len(toks_per_doc), dtype=np.int32)
            for p in range(width):
                val |= pos[:, k * width + p].astype(np.int32) << p
            out[f"ch{k}"] = val
        return pd.DataFrame(out)

    sh = (
        df.select(F.col(id_col), simhash_chunks(F.col(text_col)).alias("__s"))
        .select(
            F.col(id_col),
            *[F.col(f"__s.ch{k}").alias(f"__ch{k}") for k in range(chunks)],
        )
        .persist()
    )

    banded = sh.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("chunk"), F.col(f"__ch{k}").alias("val"))
                    for k in range(chunks)
                ]
            )
        ).alias("__b"),
    ).select(id_col, "__b.chunk", "__b.val")
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["chunk", "val"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    sha = sh.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"__ch{k}").alias(f"__a{k}") for k in range(chunks)],
    )
    shb = sh.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"__ch{k}").alias(f"__b{k}") for k in range(chunks)],
    )
    ham = sum(
        [
            F.bit_count(F.col(f"__a{k}").bitwiseXOR(F.col(f"__b{k}")))
            for k in range(chunks)
        ],
        F.lit(0),
    )
    pairs = (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .filter(ham <= max_hamming)
        .select("id_b")
        .distinct()
    )
    out = df.join(pairs.withColumnRenamed("id_b", id_col), on=id_col, how="left_anti")
    return _swap_cache(out, sh)


@F.pandas_udf(T.LongType())
def _simhash_of_text(texts: pd.Series) -> pd.Series:
    """64-bit SimHash computed wholly Arrow-side: tokenize, hash tokens
    (blake2b, 8 bytes; term-frequency-weighted votes — classic Charikar),
    per-bit ±count votes, sign → bit. One python pass per doc + one numpy
    matrix op — Spark's interpreted higher-order functions made the JVM
    tokenize+hash pass the bottleneck, same finding as the MinHash path."""
    import re
    from collections import Counter
    from hashlib import blake2b

    ws = re.compile(r"\s+")
    bitcols = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        norm = ws.sub(" ", (s or "").strip().lower())
        if not norm:
            continue
        counts = Counter(norm.split(" "))
        arr = np.frombuffer(
            b"".join(blake2b(t.encode(), digest_size=8).digest() for t in counts),
            dtype=np.uint64,
        )
        w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
        bits = ((arr[:, None] >> bitcols) & np.uint64(1)).astype(np.int64)
        votes = ((2 * bits - 1) * w[:, None]).sum(axis=0)
        out[i] = np.int64(np.uint64(np.packbits((votes > 0)[::-1]).view(">u8")[0]))
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """Attach a 64-bit SimHash of the (distinct) token set — Arrow-batched,
    map-only."""
    from polars_dataset_spark.session import ensure_parallelism

    return ensure_parallelism(df).withColumn(out_col, _simhash_of_text(F.col(text_col)))


def band_key_structs(sig_col: str, max_hamming: int) -> "list":
    """The ``max_hamming + 1`` pigeonhole band keys of a 64-bit signature
    column, as ``struct(chunk int, key long)`` expressions. Chunks are
    disjoint and cover ALL 64 bits: width = 64 // (k+1), with the
    remainder bits folded into the LAST chunk (its key is the plain
    unsigned right-shift — zero-fill makes a mask redundant). For k+1
    dividing 64 the keys are bit-identical to the historical fixed-width
    banding, so persisted indexes remain valid."""
    chunks = max_hamming + 1
    if not 1 <= chunks <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    width = 64 // chunks
    keys = []
    for c in range(chunks):
        shifted = F.shiftrightunsigned(F.col(sig_col), c * width)
        if c < chunks - 1:
            shifted = shifted.bitwiseAND(F.lit((1 << width) - 1))
        keys.append(F.struct(F.lit(c).alias("chunk"), shifted.alias("key")))
    return keys


def append_to_banded_index(index, sigs: DataFrame, sig_col: str = "__sig") -> None:
    """Union new 64-bit signatures into ANY persisted banded index IN
    PLACE — the incremental half of continuous ingestion for every
    modality (Image/Audio/VideoNeardupIndex all share the
    ``(chunk int, key long, __csig long)`` layout and a
    ``max_hamming`` attribute; stream batch N+1 must dedup against
    batch N's survivors, not just the original corpus).

    Cache-swap contract (same as ``_swap_cache``): the merged frame is
    materialized via eager ``localCheckpoint`` (truncating lineage, so
    a year of appends doesn't accumulate a union tree) BEFORE the old
    blocks release; only the new batch's banded rows are deduplicated
    (batch-sized shuffle — the standing index is never re-shuffled).
    At crawl scale prefer a parquet layout bucketed by (chunk, key)
    and compact appended band files offline."""
    new_banded = (
        sigs.filter(F.col(sig_col).isNotNull())
        .select(F.col(sig_col).alias("__csig"))
        .distinct()
        .select(
            "__csig",
            F.explode(
                F.array(*band_key_structs("__csig", index.max_hamming))
            ).alias("bk"),
        )
        .select("bk.chunk", "bk.key", "__csig")
    )
    merged = pin(index.banded.union(new_banded), eager=True)
    index.banded.unpersist(blocking=False)
    index.banded = merged


def hamming_band_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """All pairs within Hamming distance ``max_hamming`` over ANY 64-bit
    signature column (SimHash of text, dHash of images, ...), as
    ``(id_a, id_b, hamming)`` with ``id_a < id_b``.

    Pigeonhole banding: the signature is split into ``max_hamming + 1``
    disjoint bit-chunks covering all 64 bits (when 64 is not an even
    multiple, the remainder bits fold into the last chunk); two
    signatures within distance k differ in at most k chunks, so they
    AGREE exactly on at least one — the band equi-join has recall
    exactly 1 (not probabilistic), and candidates are verified with
    ``bit_count(a XOR b)``. Shuffle is one keyed join over ~ N * (k+1)
    banded rows, never all-pairs; everything is JVM-side codegen
    (shift/mask/bit_count). Callers whose signature is expensive to
    compute should persist ``df`` first — the band self-join scans it
    twice."""
    keys = band_key_structs(sig_col, max_hamming)  # validates k eagerly
    banded = df.select(
        id_col,
        sig_col,
        F.explode(F.array(*keys)).alias("bk"),
    ).select(id_col, sig_col, "bk.chunk", "bk.key")
    a = banded.select(F.col(id_col).alias("id_a"), F.col(sig_col).alias("h_a"), "chunk", "key")
    b = banded.select(F.col(id_col).alias("id_b"), F.col(sig_col).alias("h_b"), "chunk", "key")
    return (
        a.join(b, on=["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup removal by SimHash: candidates from Hamming-band blocking
    (:func:`hamming_band_pairs` — pigeonhole, recall exactly 1), verified
    with exact ``bit_count(a XOR b) <= k``. Drops the larger id of each
    pair."""
    # persist: the banded self-join references this frame twice and the
    # simhash UDF would otherwise run once per branch
    sh = simhash(df.select(id_col, text_col), text_col).select(id_col, "simhash").persist()
    pairs = hamming_band_pairs(sh, id_col=id_col, sig_col="simhash", max_hamming=max_hamming)
    losers = _swap_cache(pairs.select(F.col("id_b").alias(id_col)).distinct(), sh)
    return df.join(losers, on=id_col, how="left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Character n-gram Jaccard near-duplicate pairs: the MinHash-LSH
    candidate path over char shingles, exact-verified. Same scaling story
    as :func:`minhash_lsh_candidates`."""
    return minhash_lsh_candidates(
        df,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_size=n,
        shingle_kind="char",
        threshold=threshold,
    )


def contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "contaminated",
) -> DataFrame:
    """Benchmark-decontamination flag (the train/test-leakage guard every
    pretraining pipeline needs): a document is contaminated when it shares
    at least one token ``n``-gram with the benchmark set.

    Scale shape: the benchmark's distinct n-gram set BROADCASTS (a
    benchmark is small by definition); the corpus side is a map-only
    shingle explode + broadcast hash join + distinct-ids semi-aggregation
    — no corpus-sized shuffle, no pairwise comparison."""
    from polars_dataset_spark.session import ensure_parallelism
    from polars_dataset_spark.functions.text import tokenize as _tok

    df = ensure_parallelism(df)  # the n-gram explode is the heavy map stage
    doc_grams = df.withColumn("__toks", _tok(F.col(text_col))).select(
        F.col(id_col), F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("__g")
    )
    bench_grams = (
        benchmark.withColumn("__toks", _tok(F.col(text_col)))
        .select(F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("__g"))
        .distinct()
    )
    hit = (
        doc_grams.join(F.broadcast(bench_grams), on="__g")
        .select(id_col)
        .distinct()
        .withColumn(out_col, F.lit(1))
    )
    return df.join(hit, on=id_col, how="left").fillna({out_col: 0})


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop every document sharing a token n-gram with the benchmark."""
    flagged = contamination_flags(df, benchmark, n=n, id_col=id_col, text_col=text_col)
    return flagged.filter(F.col("contaminated") == 0).drop("contaminated")


def embedding_neardup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column: random-
    hyperplane LSH buckets (sign signature of ``planes`` fixed projections,
    computed in one Arrow-batched UDF), then EXACT cosine verification of
    within-bucket pairs with JVM-side ``aggregate``/``zip_with`` arithmetic.

    With ``planes=p``, P[same bucket] = (1 - θ/π)^p — at threshold 0.95
    (θ≈18°) ≈ 0.96^16 ≈ 0.5 per table; callers needing higher recall can
    union several seeds. Shuffle volume is |vecs|, pair work is per-bucket."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    rng = np.random.RandomState(seed)
    hyper = rng.normal(size=(dim, planes)).astype(np.float64)

    @F.pandas_udf("long")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        signs = (mat @ hyper) > 0
        weights = (1 << np.arange(planes, dtype=np.int64))
        return pd.Series(signs.astype(np.int64) @ weights)

    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    vd = df.select(
        id_col,
        F.col(vec_col),
        bucket_of(F.col(vec_col)).alias("bucket"),
        norm.alias("__norm"),
    )
    a = vd.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), F.col("__norm").alias("n_a"), "bucket"
    )
    b = vd.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), F.col("__norm").alias("n_b"), "bucket"
    )
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (F.col("n_a") * F.col("n_b")), 6))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str = "text",
    right_text: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    shingle_kind: str = "token",
) -> DataFrame:
    """Record linkage across TWO tables on near-identical text keys:
    returns ``(left_id, right_id, jaccard)`` for every cross-table pair
    whose shingle Jaccard ≥ ``threshold``.

    Same banded-LSH shape as :func:`minhash_lsh_candidates`, but the
    band-bucket join is LEFT×RIGHT instead of a self-join — both sides
    sign with the SAME seeded hash family, so a left and right record
    with similar text land in the same band bucket. Shuffle volume is
    (|L|+|R|)·bands; exact Jaccard verifies candidates only. This is
    the scale shape for entity resolution / benchmark-contamination
    lookup between corpora — never the |L|·|R| cross join."""

    def prep(df, id_col, text_col, out_id):
        sigd = minhash_signatures(
            df.select(F.col(id_col).alias(out_id), F.col(text_col).alias("__t")),
            "__t",
            num_hashes=num_hashes,
            shingle_size=shingle_size,
            shingle_kind=shingle_kind,
        ).persist()
        banded = _band_keys(sigd, out_id, num_hashes, bands)
        return sigd, banded

    sig_l, band_l = prep(left, left_id, left_text, "__lid")
    sig_r, band_r = prep(right, right_id, right_text, "__rid")
    pairs = (
        band_l.join(band_r, on=["band", "bh"])
        .select("__lid", "__rid")
        .dropDuplicates(["__lid", "__rid"])
    )
    pairs = pairs.join(
        sig_l.select("__lid", F.col("shingles").alias("sh_a")), on="__lid"
    ).join(sig_r.select("__rid", F.col("shingles").alias("sh_b")), on="__rid")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select(
            F.col("__lid").alias(left_id + "_l"),
            F.col("__rid").alias(right_id + "_r"),
            "jaccard",
        )
    )
    # materialize the (small) pair result via localCheckpoint — unlike a
    # bare persist it is ContextCleaner-collected when the caller drops
    # the frame, so repeated fuzzy_join calls don't accumulate cached
    # blocks for the session lifetime — then free the input-sized caches
    out = pin(out, eager=True)
    sig_l.unpersist()
    sig_r.unpersist()
    return out


class NeardupIndex:
    """Pre-signed LSH index of a static corpus
    (:func:`build_neardup_index`): band bucket keys ``banded``
    ``(__cid, band, bh)`` and shingle sets ``shingles``
    ``(__cid, __csh)``. ``unpersist()`` releases the backing caches
    when the index is retired."""

    def __init__(self, banded: DataFrame, shingles: DataFrame, _sig: DataFrame):
        self.banded = banded
        self.shingles = shingles
        self._sig = _sig

    def unpersist(self) -> None:
        self.banded.unpersist()
        self._sig.unpersist()


def build_neardup_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    shingle_kind: str = "token",
) -> NeardupIndex:
    """Precompute the LSH side of a STATIC reference corpus once:
    returns ``(banded, shingles)`` — the band bucket keys
    ``(__cid, band, bh)`` and the shingle sets ``(__cid, __csh)`` —
    signed with the same seeded hash family as every other MinHash op
    here, so identical texts land in identical buckets.

    This is the piece that makes continuous-ingestion dedup scale: the
    corpus (the big side) is shingled and signed ONE time, then every
    arriving batch pays only its own signatures plus a bucket equi-join
    against this index (see :func:`neardup_filter_against` and
    ``streaming.stream_neardup_filter``). Both frames are persisted;
    for an index that outlives a session, write them to parquet and
    read back. At 100 TB the banded frame is |corpus|·bands rows of
    three longs — write it bucketed by ``(band, bh)`` and the per-batch
    probe join is exchange-free on the corpus side."""
    sigd = minhash_signatures(
        corpus.select(F.col(id_col).alias("__cid"), F.col(text_col).alias("__t")),
        "__t",
        num_hashes=num_hashes,
        shingle_size=shingle_size,
        shingle_kind=shingle_kind,
    ).persist()
    banded = _band_keys(sigd, "__cid", num_hashes, bands).persist()
    shingles = sigd.select("__cid", F.col("shingles").alias("__csh"))
    return NeardupIndex(banded, shingles, sigd)


def neardup_filter_against(
    docs: DataFrame,
    index: NeardupIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    shingle_kind: str = "token",
) -> DataFrame:
    """Drop every row of ``docs`` whose text is a near-duplicate (exact
    shingle Jaccard ≥ ``threshold``) of ANY document in the pre-built
    reference index (:func:`build_neardup_index`) — dedup of new data
    against an existing corpus, the row-filter complement of
    :func:`fuzzy_join`'s pair output. All other ``docs`` columns pass
    through. LSH parameters must match the ones the index was built
    with (same defaults)."""
    banded_c, shingles_c = index.banded, index.shingles
    sig_d = minhash_signatures(
        docs.select(F.col(id_col).alias("__did"), F.col(text_col).alias("__t")),
        "__t",
        num_hashes=num_hashes,
        shingle_size=shingle_size,
        shingle_kind=shingle_kind,
    ).persist()
    banded_d = _band_keys(sig_d, "__did", num_hashes, bands)
    cand = (
        banded_d.join(banded_c, on=["band", "bh"])
        .select("__did", "__cid")
        .dropDuplicates(["__did", "__cid"])
    )
    ver = cand.join(
        sig_d.select("__did", F.col("shingles").alias("__dsh")), on="__did"
    ).join(shingles_c, on="__cid")
    inter = F.size(F.array_intersect("__dsh", "__csh")).cast("double")
    union = F.size(F.array_union("__dsh", "__csh")).cast("double")
    hit = pin(
        ver.filter(F.round(inter / union, 6) >= F.lit(threshold))
        .select(F.col("__did").alias(id_col))
        .distinct(),
        eager=True,
    )  # output-sized pin; frees sig_d safely
    sig_d.unpersist()
    return docs.join(hit, on=id_col, how="left_anti")


def remove_repeated_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    out_col: str = "cleaned_text",
) -> DataFrame:
    """Exact repeated-substring EXCISION — the span-level complement of
    document-level dedup (the "exact substring deduplication" of Lee et
    al. 2022, arXiv:2107.06499, at token granularity): any k-token
    window whose exact content occurs ``min_count``+ times in the whole
    corpus (across documents OR repeated within one) is cut out of
    every document, and the surviving tokens are rejoined. Catches the
    boilerplate headers/footers/license blocks that document-level
    MinHash cannot (the documents differ; the spans don't).

    Adds ``n_tokens``, ``n_removed`` and ``out_col`` (tokens surviving,
    space-joined; "" when everything was cut or the text was empty).
    Tokenization is :func:`text.tokenize` (lowercased whitespace split),
    so removal is on normalized tokens.

    Scale shape (two data shuffles + one gram shuffle, nothing
    quadratic):

    - gram stage is map-only from the token array; grams shuffle by
      their **md5 key** (32 bytes, engine-portable), never the k-token
      text, for the global count;
    - duplicated-key set semi-joins back to the gram positions;
    - coverage is a per-document running-max window — token position p
      is covered iff some duplicated gram STARTS in [p-k+1, p]. Hit
      rows are UNIONED into the token stream (tagged, ordered before
      the token at the same position) rather than joined on
      ``(doc, pos)``: a join would partition by the pair key, which
      cannot satisfy the window's doc-only partitioning, costing the
      token stream a second full shuffle. The union sorts once per doc
      and the rebuild's groupBy reuses that same doc-key exchange.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    from pyspark.sql import Window

    from polars_dataset_spark.functions.text import tokenize

    # pin the tokenized corpus: `t` feeds both the gram stage (which is
    # itself consumed twice — the duplicate-key aggregate and the
    # position semi-join) and the token stream, so the regex
    # tokenization of every document would otherwise run once per
    # reference (r12 audit: 4 scans of the source in the plan)
    t = pin(
        df.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
    )
    # gram key = md5 over the CONCATENATION OF PER-TOKEN md5 DIGESTS:
    # fixed-length hex segments make the key injective in the token
    # sequence — a separator-joined form would collide when a token itself
    # contains the separator byte (tokenize only splits on whitespace, so
    # control bytes survive into tokens). Token digests are computed ONCE
    # per token (hoisted column), not per gram.
    grams = t.withColumn(
        "__thash", F.expr("transform(__toks, t -> md5(t))")
    ).select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"CASE WHEN size(__toks) >= {k} THEN "
                f"transform(sequence(1, size(__toks) - {k - 1}), "
                f"i -> md5(array_join(slice(__thash, i, {k}), ''))) "
                f"ELSE array() END"
            )
        ).alias("__gpos", "__gkey"),
    )
    dup = (
        grams.groupBy("__gkey")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("__gkey")
    )
    hits = (
        grams.join(dup, "__gkey", "left_semi")
        .select(
            F.col(id_col),
            F.col("__gpos").alias("__pos"),
            F.lit(None).cast("string").alias("__tok"),
            F.col("__gpos").alias("__hit"),
        )
    )
    tok = t.select(
        F.col(id_col), F.posexplode(F.col("__toks")).alias("__pos", "__tok")
    ).withColumn("__hit", F.lit(None).cast("long"))
    u = tok.unionByName(hits)
    # hit rows order BEFORE the token at the same position (False < True)
    # so a gram starting AT p is inside p's running-max frame
    w = (
        Window.partitionBy(id_col)
        .orderBy(F.col("__pos"), F.col("__tok").isNotNull())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = (
        u.withColumn("__runmax", F.max(F.col("__hit")).over(w))
        .filter(F.col("__tok").isNotNull())
    )
    cov = F.col("__runmax").isNotNull() & (
        F.col("__runmax") >= F.col("__pos") - (k - 1)
    )
    agg = (
        j.withColumn("__cov", cov)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__cov").cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("__cov"), F.struct("__pos", "__tok"))
                        )
                    ),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias(out_col),
        )
    )
    # output columns OVERWRITE any same-named input columns (e.g. an
    # n_tokens from with_token_count) — dropping first keeps the join
    # unambiguous instead of raising on a duplicate reference
    return (
        df.drop("n_tokens", "n_removed", out_col)
        .join(agg, id_col, "left")
        .withColumns(
            {
                "n_tokens": F.coalesce(F.col("n_tokens"), F.lit(0)),
                "n_removed": F.coalesce(F.col("n_removed"), F.lit(0)),
                out_col: F.coalesce(F.col(out_col), F.lit("")),
            }
        )
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scope_cols: "tuple[str, ...] | list[str]" = (),
    keep_blank: bool = True,
) -> DataFrame:
    """C4-style LINE-level deduplication: every line that occurs more
    than once in the corpus keeps only its FIRST occurrence (document
    order by ``id_col``, then line position) and disappears everywhere
    else — the classic boilerplate killer (nav menus, cookie banners,
    copyright footers repeat across pages verbatim; shingle-level dedup
    misses them because the surrounding prose differs).

    ``scope_cols`` narrows the dedup universe (e.g. ``["source"]`` =
    only dedup lines *within* a crawl source). Blank lines are kept
    verbatim by default (they are document structure, not content).

    Returns ``(id_col, *scope_cols, text, n_lines, n_kept)`` with
    ``text`` rebuilt from the kept lines in original order; documents
    whose every line was deduped away keep an empty text.

    Scale shape: one explode (map-only), ONE line-keyed window shuffle
    for the first-occurrence rank, one doc-keyed aggregation to rebuild
    — no joins, no driver state. The window key is ``md5(line)`` so
    the exchange hashes 32-byte digests; ties inside a digest bucket
    order by (id, pos), giving a total deterministic order. At 100 TB
    the line-keyed exchange is the cost — same class as every dedup in
    this module. AQE's skew splitting does NOT apply to window
    exchanges (only to skewed join sides), so the heaviest keys would
    each serialize into one task; with ``keep_blank=True`` the worst
    offender by far — the blank line — is ROUTED AROUND the window
    entirely (kept unconditionally, so it needs no rank), and the
    residual skew is ordinary boilerplate lines whose per-key row
    counts are corpus-bounded.

    Reference-parity note: the reference engine has no corpus surface;
    this is part of the LLM-pipeline extension family (the same
    public-recipe family as functions/dsir.py — C4's three-sentence
    rule's line-level cousin, per the public C4/RefinedWeb writeups).
    """
    scope = list(scope_cols)
    lines = df.select(
        F.col(id_col),
        *[F.col(c) for c in scope],
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    is_blank = F.trim(F.col("line")) == ""
    w = Window.partitionBy(*scope, F.md5(F.col("line"))).orderBy(id_col, "pos")
    if keep_blank:
        # blank lines are kept unconditionally, so they need no rank:
        # route them AROUND the window shuffle (the blank line is the
        # single heaviest key in any real corpus, and AQE does not
        # split window-exchange skew) and union back before the rebuild
        ranked = (
            lines.filter(~is_blank)
            .withColumn("__keep", F.row_number().over(w) == 1)
            .unionByName(lines.filter(is_blank).withColumn("__keep", F.lit(True)))
        )
    else:
        ranked = lines.withColumn("__keep", F.row_number().over(w) == 1)
    kept_line = F.when(F.col("__keep"), F.col("line"))
    return (
        ranked.groupBy(id_col, *scope)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.col("__keep").cast("long")).cast("long").alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("__keep"), F.struct(F.col("pos"), F.col("line")))
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias(text_col),
        )
        .select(id_col, *scope, text_col, "n_lines", "n_kept")
    )

def drop_frequent_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    scope_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """RefinedWeb-style frequent-line REMOVAL: any line occurring in at
    least ``min_docs`` DISTINCT documents is boilerplate and is removed
    from EVERY document — including the first (unlike
    :func:`dedup_lines`, which keeps one copy; a nav menu's first
    occurrence is just as worthless as its millionth). Lines below the
    threshold are untouched, so rare legitimate repetition (quotes,
    citations) survives. Blank lines are always kept as structure.

    Returns ``(id_col, *scope_cols, text, n_lines, n_kept)`` with
    ``text`` rebuilt from the kept lines in original order.

    Scale shape: one explode, one line-digest-keyed aggregation down to
    distinct lines (map-side combined; the per-line doc count is an
    exact ``countDistinct(id)``), then a left join of the line stream
    against the frequent set, and one doc-keyed rebuild. The frequent
    set is usually small, but on a web-scale corpus the ≥``min_docs``
    (default 3) line set is NOT bounded — so the join strategy is left
    to AQE, which broadcasts it when its runtime size is under the
    threshold and shuffles otherwise (a forced broadcast here could OOM
    the driver; ADVICE r5). The digest keys mean both the aggregation
    and the join shuffle 32-byte md5s, never line text."""
    scope = list(scope_cols)
    lines = df.select(
        F.col(id_col),
        *[F.col(c) for c in scope],
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("__lh", F.md5(F.col("line")))
    is_blank = F.trim(F.col("line")) == ""
    freq = (
        lines.filter(~is_blank)
        .groupBy(*scope, "__lh")
        .agg(F.countDistinct(id_col).alias("__docs"))
        .filter(F.col("__docs") >= min_docs)
        .select(*scope, "__lh", F.lit(True).alias("__frequent"))
    )
    tagged = lines.join(freq, on=[*scope, "__lh"], how="left")
    kept_struct = F.when(
        is_blank | F.col("__frequent").isNull(),
        F.struct(F.col("pos"), F.col("line")),
    )
    return (
        tagged.groupBy(id_col, *scope)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(kept_struct.isNotNull().cast("long")).cast("long").alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
                ),
            ).alias(text_col),
        )
        .select(id_col, *scope, text_col, "n_lines", "n_kept")
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    col: str = "text",
    max_dist: int = 2,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
) -> DataFrame:
    """Edit-distance (Levenshtein) join: pairs whose strings differ by
    at most ``max_dist`` unit edits, with PassJoin-style SEGMENT
    blocking (Li et al., "PassJoin", PVLDB 2011 -- public paper):

    - each RIGHT string of length ``l >= k+1`` splits into ``k+1``
      contiguous segments; by pigeonhole, any string within ``k`` edits
      contains at least one segment VERBATIM, shifted by at most ``k``
      positions -- so the right side emits ``k+1`` keys
      ``(l, i, segment)``;
    - each LEFT string emits, for every candidate right-length in
      ``[len-k, len+k]`` and every segment slot, the substrings in the
      +-k position window -- a bounded ``O(k^3)``-per-row fan-out of
      SHORT substring keys (deduplicated), recall 1 by construction;
    - the equi-join on ``(l, i, segment)`` yields only pairs sharing an
      exact segment -- selective even when every string has the SAME
      length (where plain length blocking degenerates to all-pairs:
      found by the 10x off-scale sweep, x9.8 on fixed-width prefixes);
    - exact JVM-side ``levenshtein`` verifies candidates; no UDFs.

    Right strings shorter than ``k+1`` cannot be segmented (some
    segment would be empty and match everywhere); they fall back to
    plain length-bucket keys -- strings that short have at most
    ``alphabet^k`` distinct values, so dedupe-by-value upstream if they
    dominate. Complements :func:`fuzzy_join` (token-set Jaccard): edit
    distance catches character-level typos and OCR noise that token
    shingles miss. Returns ``(id_a, id_b, dist)``."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    k = max_dist
    kk = k + 1

    def seg_params(l_col, i):
        # segment lengths: first (k+1 - l%(k+1)) segments get l//(k+1),
        # the rest one more; start positions accumulate
        base = F.floor(l_col / kk).cast("int")
        rem = (l_col % kk).cast("int")
        extra = F.when(i >= (F.lit(kk) - rem), F.lit(1)).otherwise(F.lit(0))
        seg_len = base + extra
        start = i * base + F.greatest(i - (F.lit(kk) - rem), F.lit(0))
        return seg_len, start

    sv = F.col(col)
    if k == 0:
        l = left.select(F.col(left_id).alias("id_a"), sv.alias("__sa"))
        r = right.select(F.col(right_id).alias("id_b"), sv.alias("__sb"))
        return (
            l.join(r, l["__sa"] == r["__sb"])
            .select("id_a", "id_b", F.lit(0).cast("long").alias("dist"))
            .distinct()
        )

    slen = F.length(sv)
    # RIGHT: one key per segment (l:i:seg), or the short-string bucket
    r_keys = F.when(
        slen >= kk,
        F.transform(
            F.sequence(F.lit(0), F.lit(k)),
            lambda i: F.concat_ws(
                ":",
                slen,
                i,
                F.substring(sv, seg_params(slen, i)[1] + 1, seg_params(slen, i)[0]),
            ),
        ),
    ).otherwise(F.array(F.concat_ws(":", F.lit("S"), slen)))
    r = right.select(
        F.col(right_id).alias("id_b"), sv.alias("__sb"), F.explode(r_keys).alias("__blk")
    )

    # LEFT: for each candidate right length l in [len-k, len+k]:
    #   l >= k+1 -> window substrings per segment slot; l <= k -> short bucket
    def left_keys_for_l(l):
        def slot(i):
            seg_len, start = seg_params(l, i)
            lo = F.greatest(start - F.lit(k), F.lit(0))
            hi = F.least(start + F.lit(k), slen - seg_len)
            return F.when(
                (hi >= lo) & (seg_len >= 1),
                F.transform(
                    F.sequence(lo, hi),
                    lambda p: F.concat_ws(
                        ":", l, i, F.substring(sv, p + 1, seg_len)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))

        segment_keys = F.flatten(
            F.transform(F.sequence(F.lit(0), F.lit(k)), slot)
        )
        return F.when(l >= kk, segment_keys).otherwise(
            F.array(F.concat_ws(":", F.lit("S"), l))
        )

    all_keys = F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(F.greatest(slen - F.lit(k), F.lit(0)), slen + F.lit(k)),
                left_keys_for_l,
            )
        )
    )
    l = left.select(
        F.col(left_id).alias("id_a"), sv.alias("__sa"), F.explode(all_keys).alias("__blk")
    )
    # Explicit NUMBERED repartition by the block key on the probe side:
    # the segment-key shuffle is tiny (short substring keys) so AQE's
    # byte-based coalescing collapses it to ONE post-shuffle partition —
    # but the join OUTPUT explodes (every pair sharing a segment) and the
    # levenshtein verify then runs single-task (measured: 6.5 s of
    # single-core verify at sf0.1; guide §2.5's "coalesced by input
    # bytes, exploded by output" trap). repartition(n, col) has
    # REPARTITION_BY_NUM origin, which AQE's CoalesceShufflePartitions
    # NEVER coalesces — the column-only form (REPARTITION_BY_COL) is in
    # its supported origins and could still collapse under different
    # advisory sizes (ADVICE r12). The build side carries no repartition:
    # its ENSURE_REQUIREMENTS exchange aligns to the probe's partition
    # count when the join shuffles, and when AQE promotes it to a
    # broadcast the probe-side spread survives as the join's output
    # partitioning with no wasted build-side shuffle.
    n_spread = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    joined = l.repartition(n_spread, "__blk").join(r, on="__blk")
    return (
        joined.withColumn("dist", F.levenshtein(F.col("__sa"), F.col("__sb")))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
        .distinct()
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask_bits: int = 5,
) -> DataFrame:
    """Content-defined chunking: split each document at positions chosen
    by CONTENT, not offset, so an insertion near the top of a document
    shifts no chunk boundary below it — the property that makes
    chunk-hash dedup robust to edits (the rsync/LBFS/storage-dedup
    boundary idea — public; the hash here is the engine-portable md5
    gram hash, not Rabin, so the oracle replays it in SQL).

    Rule: position ``i`` (1-based, ``i >= window``) ends a chunk iff the
    60-bit md5 hash of the ``window`` characters ending at ``i`` is
    ``0 mod 2^mask_bits`` — expected chunk length ``2^mask_bits``. The
    final tail (boundary position < length) is always its own chunk;
    documents shorter than ``window`` are one chunk; documents with
    NULL ``text_col`` emit NO rows (there is nothing to chunk). Emits
    ``(id_col, chunk_idx, chunk_start, chunk_len, chunk_text,
    chunk_hash)`` with ``chunk_start`` 0-based and chunks concatenating
    back to the exact original text (q199's rebuild oracle).

    Scale shape: pure codegen'd expressions (sequence → md5 filter →
    slice), map-only — no shuffle, no Python. The md5-per-position
    constant is deliberate for oracle portability; a production variant
    would swap in a Gear rolling hash inside ``mapInPandas`` with the
    same boundary semantics.
    """
    if window <= 0 or mask_bits <= 0:
        raise ValueError(f"window/mask_bits must be positive: {window}/{mask_bits}")
    mask = 1 << mask_bits
    empty = F.array().cast("array<int>")
    t = F.col("__t")
    n = F.length(t)
    # Each stage below aliases its expensive intermediate into its OWN
    # projection and the next stage references the alias several times:
    # CollapseProject refuses to merge projections when that would
    # duplicate a non-cheap alias, so the md5-per-position boundary chain
    # is evaluated ONCE per row — the single-projection form inlined it
    # at every reference (16 copies of the md5 filter in the optimized
    # plan, a measured ~1.4x slowdown).
    #
    # boundary positions: 1-based end positions whose trailing gram hashes
    # to 0 mod 2^mask_bits; guard the sequence — F.sequence DESCENDS when
    # stop < start, so short docs must yield [] explicitly
    positions = F.when(
        n >= window, F.sequence(F.lit(window), n)
    ).otherwise(empty)
    is_boundary = lambda i: (
        F.conv(
            F.substring(F.md5(F.substring(t, i - F.lit(window - 1), window)), 1, 15),
            16,
            10,
        ).cast("long")
        % mask
        == 0
    )
    staged = df.select(F.col(id_col), F.col(text_col).alias("__t")).select(
        id_col, "__t", F.filter(positions, is_boundary).alias("__b")
    )
    # chunk ends = boundaries + the final tail end (deduped when the last
    # boundary IS the end); starts = 0 ++ boundaries. NULL text short-
    # circuits to NO rows (empty ends → posexplode emits nothing) —
    # without the guard, NULL n made ends [NULL] and emitted one
    # all-NULL garbage chunk per NULL document (ADVICE r5)
    b = F.col("__b")
    ends = F.when(t.isNull(), empty).otherwise(
        F.when(
            (F.size(b) > 0) & (F.element_at(b, -1) == n), b
        ).otherwise(F.concat(b, F.array(n)))
    )
    staged = staged.select(id_col, "__t", ends.alias("__ends"))
    # starts mirrors ends: EMPTY when ends is empty (NULL text) — an
    # unconditional concat would make starts [0] and zip_with would
    # NULL-pad back to one garbage row; and the slice length must be
    # clamped >= 0 or NULL docs throw INVALID_PARAMETER_VALUE.LENGTH
    e = F.col("__ends")
    starts = F.when(F.size(e) == 0, empty).otherwise(
        F.concat(
            F.array(F.lit(0)),
            F.slice(e, 1, F.greatest(F.size(e) - 1, F.lit(0))),
        )
    )
    staged = staged.select(id_col, "__t", "__ends", starts.alias("__starts"))
    chunks = F.zip_with(
        F.col("__starts"),
        e,
        lambda s, x: F.struct(
            s.alias("start"), (x - s).alias("len"), F.substring(t, s + 1, x - s).alias("txt")
        ),
    )
    return (
        staged.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            id_col,
            "chunk_idx",
            F.col("c.start").alias("chunk_start"),
            F.col("c.len").alias("chunk_len"),
            F.col("c.txt").alias("chunk_text"),
            F.md5(F.col("c.txt")).alias("chunk_hash"),
        )
    )
