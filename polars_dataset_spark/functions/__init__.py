from polars_dataset_spark.functions.text import (
    with_text_stats,
    with_repetition_stats,
    with_token_count,
    with_language_id,
    with_quality_score,
    with_fingerprint,
    tokenize,
)
from polars_dataset_spark.functions.dedup import (
    exact_dedup,
    contamination_flags,
    decontaminate,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_dedup,
    simhash,
    simhash_dedup,
    simhash_dedup_portable,
    ngram_jaccard_pairs,
    embedding_neardup,
)
from polars_dataset_spark.functions.similarity import (
    cosine_topk,
    cosine_pairs_block,
    ivf_topk,
    lsh_bucketed_topk,
)
from polars_dataset_spark.functions.graph import (
    chain_edges,
    connected_components,
    dedup_by_components,
)
from polars_dataset_spark.functions.sampling import (
    hash_sample,
    hash_sample_by,
    stratified_sample,
    temperature_mix,
    take_until_token_budget,
)
from polars_dataset_spark.functions.packing import pack_sequences
from polars_dataset_spark.functions.pipeline import clean_corpus, corpus_report
from polars_dataset_spark.functions.multimodal import (
    binary_with_metadata,
    decode_media,
    extract_features,
)

__all__ = [
    "with_text_stats",
    "with_repetition_stats",
    "with_language_id",
    "with_quality_score",
    "with_fingerprint",
    "tokenize",
    "exact_dedup",
    "contamination_flags",
    "decontaminate",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_dedup",
    "simhash",
    "simhash_dedup",
    "simhash_dedup_portable",
    "ngram_jaccard_pairs",
    "embedding_neardup",
    "cosine_topk",
    "cosine_pairs_block",
    "ivf_topk",
    "lsh_bucketed_topk",
    "with_token_count",
    "binary_with_metadata",
    "decode_media",
    "extract_features",
    "clean_corpus",
    "corpus_report",
    "chain_edges",
    "connected_components",
    "dedup_by_components",
    "hash_sample",
    "hash_sample_by",
    "stratified_sample",
    "temperature_mix",
    "take_until_token_budget",
    "pack_sequences",
]
