"""Bucketed table layout — co-located joins without shuffles.

At 100 TB the dominant cost of a fact-fact equi join is shuffling both
sides. Writing both tables bucketed (and sorted) on the join key makes
the join a zero-exchange sort-merge: each task reads matching bucket
files from both sides. This is the persistent-layout analog of the
reference keeping its static relation pre-hashed in memory
(``StaticHashJoin.h:30-46``) — but for big-big joins the broadcast
trick can't serve.

Bucket metadata lives in the session catalog (``saveAsTable``); pick
``n_buckets`` so each bucket is a few hundred MB at target scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on the join key."""
    cols = list(bucket_cols)
    w = df.write.bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    w.mode(mode).saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — plans as a shuffle-free
    sort-merge join when bucket specs line up (verify with
    ``assert_no_shuffle``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle exchange — the
    layout contract check for co-located joins."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError("plan contains a shuffle exchange:\n" + plan)
