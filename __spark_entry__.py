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

# Queries without an ever-green driver CORRECTNESS row (union of r01+r02
# sweeps, both capped at 50) — checked right after the canonical set so
# every query earns a green row under any sweep cap. Round 3: the r02
# fail (feature hash, output reshaped), the r01 hash-fail fixed in r02
# but never re-swept (pivot), the two as-of queries whose r02 green was
# vacuous (0 rows — now non-empty by construction), the 14 post-cap
# stragglers, then every NEW round-3 query.
_UNVERIFIED = [
    "text_feature_hash_vectors",
    "pivot_event_counts_by_day",
    "asof_event_last_order_3d",
    "asof_event_next_order",
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
    # --- new in round 3 ---
    "sg1_ref_window_3600_1_minmax",
    "dedup_ngram_jaccard_prefix",
]


def _ordered(mapping: dict) -> dict:
    order = [n for n in (*_CANONICAL, *_UNVERIFIED) if n in mapping]
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
