from lightsaber_spark.functions.text import (
    tokens,
    token_count,
    normalize_text,
    text_stats,
    repetition_stats,
    quality_filter,
    language_id,
    doc_fingerprint,
    feature_hash_vector,
    feature_hash_vector_udf,
    bm25_topk,
    term_tf_table,
)
from lightsaber_spark.functions.dedup import (
    exact_dup_groups,
    word_shingles,
    shingle_hash,
    ngram_jaccard_pairs,
    minhash_signature,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
    embedding_neardup_pairs,
    embedding_lsh_pairs,
    duplicate_groups,
    contamination_check,
    release_shingle_caches,
)
from lightsaber_spark.functions.similarity import (
    int_cosine,
    brute_force_topk,
    hyperplane_lsh_topk,
    ivf_topk,
    kmeans_fit_scaled,
)
from lightsaber_spark.functions.sampling import (
    hash_sample,
    hash_split,
    mixture_sample,
    stratified_sample_exact,
)
from lightsaber_spark.functions.packing import pack_sequences

__all__ = [
    "tokens", "token_count", "normalize_text", "text_stats",
    "repetition_stats", "quality_filter", "language_id", "doc_fingerprint",
    "feature_hash_vector", "feature_hash_vector_udf", "bm25_topk",
    "term_tf_table",
    "exact_dup_groups", "word_shingles", "shingle_hash", "ngram_jaccard_pairs",
    "minhash_signature", "minhash_lsh_pairs", "simhash", "simhash_pairs",
    "embedding_neardup_pairs", "embedding_lsh_pairs", "duplicate_groups",
    "contamination_check", "release_shingle_caches",
    "int_cosine", "brute_force_topk", "hyperplane_lsh_topk", "ivf_topk",
    "kmeans_fit_scaled",
    "hash_sample", "hash_split", "mixture_sample", "stratified_sample_exact",
    "pack_sequences",
]
