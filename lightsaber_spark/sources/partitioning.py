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
