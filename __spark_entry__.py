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

# Staleness is MECHANIZED (round-3 verdict #2): a green driver row
# vouches for a query only while the query's implementation hash
# (lightsaber_spark.staleness.impl_hash — callable source + transitive
# lightsaber_spark call closure + oracle SQL) matches the hash recorded
# in QUERY_HASHES.json at the time of that green row.  Any rewrite —
# of the query wrapper OR of an engine function it calls — changes the
# hash and automatically rotates the query to the front of the sweep;
# scripts/record_hashes.py re-records after the next driver sweep
# greens it.  This replaces round-3's hand-maintained _FORCE_RECHECK
# list (whose 13 entries are now expressed as absent/old hash records).


def _vouch_state() -> tuple[dict[str, str], dict[str, dict]]:
    from lightsaber_spark.staleness import current_hashes, recorded_hashes

    global _VOUCH_CACHE
    if _VOUCH_CACHE is None:
        _VOUCH_CACHE = (current_hashes(), recorded_hashes())
    return _VOUCH_CACHE


_VOUCH_CACHE: tuple[dict[str, str], dict[str, dict]] | None = None


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
    top verification ask) before hash-staled greens (implementation
    changed since the row — see _vouch_state) before older-green before
    recently-green, original registration order as the tie-break. New
    queries have no CORRECTNESS row → front. The driver's sweep cap
    (~50) truncates the tail, so tier order is what guarantees the
    highest-information queries get their row first."""
    from lightsaber_spark.staleness import is_vouched

    last = _last_green_round()
    current, recorded = _vouch_state()
    reg_index = {n: i for i, n in enumerate(mapping)}
    rest = [n for n in mapping if n not in set(_CANONICAL)]

    def tier(n: str) -> int:
        if n not in last:
            return -2  # never had any green driver row
        if not is_vouched(n, current, recorded):
            return -1  # green, but the implementation changed since
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
