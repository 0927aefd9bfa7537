"""Post-window operations: per-window argmax / top-k.

Reference: ``setPostWindowOperation`` — a raw C++ reduction injected
over each completed window's hash table, used by NEXMark Q5 to emit the
auction(s) with the max bid count per window
(``src/cql/operators/codeGeneration/OperatorKernel.h:182-188``;
``test/benchmarks/applications/Nexmark/NBQ5.cpp:42,73-103``).

Spark-first: a second aggregation with ``max_by`` (single winner) or a
rank-filter (top-k, ties kept) — both are ordinary shuffles on the
window column, map-side combinable, no custom state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def post_window_argmax(
    windowed: DataFrame,
    window_cols: Sequence[str],
    key_col: str,
    value_col: str,
    keep_ties: bool = True,
) -> DataFrame:
    """Per window, the key with the maximum value.

    ``keep_ties=True`` matches the reference post-op, which emits every
    key reaching the max (``NBQ5.cpp:85-99`` collects all maxima);
    ``False`` uses ``max_by`` (one winner, cheaper: no window function).
    """
    wcols = list(window_cols)
    if not keep_ties:
        return windowed.groupBy(*wcols).agg(
            F.max_by(F.col(key_col), F.col(value_col)).alias(key_col),
            F.max(F.col(value_col)).alias(value_col),
        )
    mx = windowed.groupBy(*wcols).agg(F.max(F.col(value_col)).alias("_mx"))
    return (
        windowed.join(mx, wcols)
        # null-safe: a window whose value_col is all NULL has _mx NULL,
        # and a plain == filter dropped the whole window while the
        # max_by path emitted it — the two modes must agree on group
        # coverage, not just tie handling (r12 review)
        .filter(F.col(value_col).eqNullSafe(F.col("_mx")))
        .select(*wcols, key_col, value_col)
    )


def window_topk(
    windowed: DataFrame,
    window_cols: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Top-k rows per window by ``order_col`` (deterministic with
    tie_breakers). row_number over a window partitioned by the window
    columns — state per group is O(k) after the rank filter and the
    partition count equals the number of windows, so this scales with
    window cardinality, not row count."""
    ob = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    ob += [F.col(c).asc() for c in tie_breakers]
    w = Window.partitionBy(*[F.col(c) for c in window_cols]).orderBy(*ob)
    return (
        windowed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
