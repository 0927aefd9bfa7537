"""Invariant tests for the text featurization ops (BM25, feature
hashing, df-cutoff Jaccard) — structural properties the oracle-parity
hash check can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightsaber_spark.functions.text import (
    bm25_select,
    feature_hash_vector,
    term_tf_table,
    token_count,
)


def test_feature_hash_mass_conservation(tables):
    """Every token lands in exactly one bucket: sum(vec) == n_tokens."""
    docs = tables["documents"]
    bad = (
        docs.select(
            token_count(F.col("text")).alias("n"),
            F.aggregate(
                feature_hash_vector(F.col("text"), 16),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("s"),
        )
        .filter(F.col("n") != F.col("s"))
        .count()
    )
    assert bad == 0


def test_bm25_rank_contract(tables):
    """Ranks are 1..k unique and scores are non-increasing in rank."""
    from lightsaber_spark.functions.text import bm25_topk

    terms = ("window", "spark", "dup")
    base = term_tf_table(tables["documents"], terms)
    rows = bm25_topk(base, terms, 20).orderBy("rnk").collect()
    assert [r["rnk"] for r in rows] == list(range(1, 21))
    scores = [r["score"] for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    assert all(s >= 0.0 for s in scores)


def test_jaccard_df_cutoff_noop_below_cutoff(tables):
    """A cutoff above the corpus's max shingle df must not change the
    result set (the valve only engages on hot shingles)."""
    from lightsaber_spark.functions.dedup import ngram_jaccard_pairs

    docs = tables["documents"]
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, 0.5, k=3).collect()
    }
    cut = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, 0.5, k=3, max_doc_freq=10**9).collect()
    }
    assert exact == cut
