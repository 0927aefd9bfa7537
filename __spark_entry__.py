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

# Queries whose past green row no longer vouches for the current code —
# mapped to the round whose re-implementation staled them: a driver
# row from any round < the value does NOT count as green (so the query
# rotates forward), while a row >= the value clears the flag
# automatically — no manual cleanup once the driver re-verifies.
# Round 3 stales (value 3, r02 rows don't vouch): the two as-of
# queries whose r02 green was vacuous (0 rows on both engines —
# rewritten to be non-empty by construction), and every r02-green query
# whose implementation this round rewrote: the Jaccard join (uncut →
# prefix+positional filtering), banded LSH top-k (different result
# set), the distributed-spine rewrite (prefix-path + gap-fill spine
# generation), the packing localCheckpoint change, the brute-force
# query-set cap, and the IVF k-means vecs_scaled fix.
_FORCE_RECHECK = {
    # candidate-stage extraction refactor (minhash_lsh_candidates) sits
    # under this query — plan-identical, but re-verify per the rule
    "dedup_minhash_lsh": 3,
    "asof_event_last_order_3d": 3,
    "asof_event_next_order": 3,
    "dedup_ngram_jaccard": 3,
    "sim_lsh_topk": 3,
    "dedup_embedding_lsh": 3,
    "sim_brute_topk": 3,
    "sim_ivf_kmeans_topk": 3,
    "sg1_ref_window_3600_1": 3,
    "gapfill_tumbling_count": 3,
    "gapfill_sliding_count": 3,
    "pack_sequences_ctx512": 3,
    "pack_sequences_shuffled_ctx512": 3,
    # r02 green was vacuous (the corpus has no exact dups — 0 rows on
    # both engines); rewritten over a dup-injected corpus
    "dedup_exact_groups": 3,
}


def _last_green_round() -> dict[str, int]:
    """Rotation rule, codified (per round-2 verdict #9): scan every
    driver-written CORRECTNESS_r*.json in the repo root and record, per
    query, the most recent round with a green row (hash_match true; for
    no-oracle-by-design queries the driver's weaker rows-only check,
    err == 'no_oracle' with a recorded row count). Queries never green
    — including past FAILURES, not just never-swept — sort first."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                last[name] = max(last.get(name, -1), rnd)
    return last


def _ordered(mapping: dict) -> dict:
    """Canonical reference-benchmark queries first, then everything else
    by staleness tier: never-green (no driver row EVER — the judge's
    top verification ask) before force-rechecked stale-greens before
    older-green before recently-green, original registration order as
    the tie-break. New queries have no CORRECTNESS row → front. The
    driver's sweep cap (~50) truncates the tail, so tier order is what
    guarantees the highest-information queries get their row first."""
    last = _last_green_round()
    reg_index = {n: i for i, n in enumerate(mapping)}
    rest = [n for n in mapping if n not in set(_CANONICAL)]

    def tier(n: str) -> int:
        if n not in last:
            return -2  # never had any green driver row
        if last[n] < _FORCE_RECHECK.get(n, 0):
            return -1  # green, but from before the staling rewrite
        return last[n]

    rest.sort(key=lambda n: (tier(n), reg_index[n]))
    order = [n for n in _CANONICAL if n in mapping] + rest
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
