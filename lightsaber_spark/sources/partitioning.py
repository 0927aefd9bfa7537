"""Partition-pruning contract check — sibling of
``bucketing.assert_no_shuffle``.

At 100 TB the cheapest byte is the one never read: a fact table
hive-partitioned on a bounded-cardinality scan predicate (event date,
region — write it with ``sinks.to_files(partition_by=...)``) lets
Catalyst prune entire directories at planning time, so a one-day query
over a three-year table touches ~0.1% of the files. This is the
disk-layout analog of the reference replaying only the requested range
of its persistent input buffers
(``src/buffers/PersistentCircularQueryBuffer.h``).

A layout only pays if the plan actually prunes — a cast or function
over the partition column silently turns the filter into a post-scan
one and the full listing is read. ``assert_partition_pruned`` makes
that a hard failure instead of a quiet 1000× regression.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def assert_partition_pruned(df: DataFrame, partition_col: str) -> str:
    """Raise unless ``df``'s scan carries a partition filter on
    ``partition_col`` (pruning happens at planning time, before any
    file is opened). Returns the matched filter text."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
    if m is None or partition_col not in m.group(1):
        raise AssertionError(
            f"scan has no partition filter on {partition_col!r}:\n" + plan
        )
    return m.group(1)


def zorder_key(x, y, bits: int = 10):
    """Morton (Z-order) interleave of two ``bits``-bit non-negative
    integer columns into one ``2·bits``-bit clustering key.

    The 100 TB use: sort/range-partition a table by this key before
    writing and BOTH dimensions stay locally bounded inside every file,
    so parquet min/max (or hive-range) pruning works for predicates on
    either column — the standard lakehouse multi-dimensional clustering
    trick (Delta/Iceberg ``ZORDER BY``), expressed as a plain integer
    Catalyst expression.

    Spark side uses ``shiftright`` (arithmetic shift = floor division
    by 2^i — exact integer arithmetic, identical to the DuckDB twin's
    ``// 2^i`` for every input; the former ``/`` + cast float quotient
    violated the repo's integer-division rule and was exact only under
    the unstated inputs-below-2^53 precondition).
    """
    from pyspark.sql import functions as F

    acc = F.lit(0).cast("bigint")
    xb_src = x.cast("bigint")
    yb_src = y.cast("bigint")
    for i in range(bits):
        xb = F.shiftright(xb_src, i) % 2
        yb = F.shiftright(yb_src, i) % 2
        acc = acc + xb * F.lit(1 << (2 * i)) + yb * F.lit(1 << (2 * i + 1))
    return acc


def zorder_oracle_expr(x_sql: str, y_sql: str, bits: int = 10) -> str:
    """DuckDB SQL twin of :func:`zorder_key` (same bit arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x_sql}) // {1 << i}) % 2 * {1 << (2 * i)}")
        terms.append(f"(({y_sql}) // {1 << i}) % 2 * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
