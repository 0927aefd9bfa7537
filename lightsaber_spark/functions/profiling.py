"""Single-pass relational data profiling (ANALYZE-style column stats).

The reference engine has no metadata/statistics layer at all; a 100 TB
pipeline cannot live without one — skew diagnosis, null audits, and
join-key cardinality estimates all start from a column profile. This is
the exact (non-sketch) profiler; pair with the KMV/CM sketches in
:mod:`lightsaber_spark.functions.sketches` when approximation is
acceptable.

Scale shape: ONE aggregate over the table computes every per-column
statistic (count / nulls / distinct). Spark plans the multi-distinct
aggregate with a single Expand + partial/final hash aggregation — one
shuffle total, rows expanded ×(n_cols) map-side, never a per-column
scan. The wide 1-row result is then unpivoted driver-free with
``stack`` into the long ``(column, ...)`` form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact per-column profile: ``(column, n_rows, n_nulls,
    n_distinct)`` — one row per profiled column, one table scan.

    ``n_distinct`` excludes NULLs (both Spark's ``count_distinct`` and
    DuckDB's ``count(DISTINCT ...)`` agree on that convention).
    """
    cols = list(df.columns) if cols is None else list(cols)
    if not cols:
        raise ValueError("no columns to profile")
    def _q(s: str) -> str:
        return "`" + s.replace("`", "``") + "`"

    # backtick-quoted references throughout: column names with
    # dots/spaces/quotes profile fine
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        qc = F.col(_q(c))
        aggs.append(F.sum(qc.isNull().cast("bigint")).alias(f"_nulls_{c}"))
        aggs.append(F.count_distinct(qc).alias(f"_dist_{c}"))
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        "'{}', {}, {}".format(c.replace("'", "''"), _q(f"_nulls_{c}"), _q(f"_dist_{c}"))
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
        ),
        F.col("_n").cast("bigint").alias("n_rows"),
    ).select(
        "column_name",
        "n_rows",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )
