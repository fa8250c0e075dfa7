"""Training-data pipeline functions over document / embedding tables:
text analysis, deduplication (exact + near-dup), similarity search,
multimodal column plumbing. All JVM-side expressions or Arrow-vectorized
pandas UDFs — no per-row Python."""

from cassovary_spark.functions.text import (
    text_stats,
    quality_score,
    token_count,
    language_id,
    doc_fingerprint,
    repetition_signals,
    word_ngrams,
    pii_signals,
    redact_pii,
    pack_sequences,
)
from cassovary_spark.functions.dedup import (
    DedupIndex,
    build_dedup_index,
    cache_scope,
    cap_per_key,
    dedup_clusters,
    exact_dedup,
    incremental_dedup,
    release_caches,
    sample_by_hash,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_buckets,
    minhash_lsh_candidates,
    simhash,
    simhash_near_dups,
)
from cassovary_spark.functions.embeddings import (
    cosine_top_k,
    lsh_bucketed_ann,
    embedding_near_dups,
)
from cassovary_spark.functions.multimodal import (
    with_binary_payload,
    decode_stub_features,
    frame_sample_stub,
)

__all__ = [
    "text_stats",
    "quality_score",
    "token_count",
    "language_id",
    "doc_fingerprint",
    "repetition_signals",
    "word_ngrams",
    "pii_signals",
    "redact_pii",
    "pack_sequences",
    "DedupIndex",
    "build_dedup_index",
    "cache_scope",
    "cap_per_key",
    "exact_dedup",
    "dedup_clusters",
    "incremental_dedup",
    "release_caches",
    "sample_by_hash",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_buckets",
    "minhash_lsh_candidates",
    "simhash",
    "simhash_near_dups",
    "cosine_top_k",
    "lsh_bucketed_ann",
    "embedding_near_dups",
    "with_binary_payload",
    "decode_stub_features",
    "frame_sample_stub",
]
