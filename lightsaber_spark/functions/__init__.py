from lightsaber_spark.functions.text import (
    tokens,
    token_count,
    normalize_text,
    text_stats,
    language_id,
    doc_fingerprint,
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
)
from lightsaber_spark.functions.similarity import (
    int_cosine,
    brute_force_topk,
    hyperplane_lsh_topk,
)

__all__ = [
    "tokens", "token_count", "normalize_text", "text_stats", "language_id",
    "doc_fingerprint",
    "exact_dup_groups", "word_shingles", "shingle_hash", "ngram_jaccard_pairs",
    "minhash_signature", "minhash_lsh_pairs", "simhash", "simhash_pairs",
    "embedding_neardup_pairs",
    "int_cosine", "brute_force_topk", "hyperplane_lsh_topk",
]
