"""Deterministic, cross-engine-checkable sketches.

Spark's built-in ``approx_count_distinct`` (HLL++) is the 100 TB
default, but its estimate is algorithm-specific — no external oracle
can reproduce it, so correctness checks degrade to rows-only. The
sketches here trade a little efficiency for **bit-exact cross-engine
reproducibility**: every randomized choice is derived from md5 of the
value (the repo's standard cross-engine hash, CLAUDE.md), so DuckDB
computes the *identical* estimate and the driver's value-hash compare
stays strong.

KMV (k-minimum-values) distinct estimator
-----------------------------------------
Keep the k smallest distinct 60-bit hashes per group; with h_(k) the
k-th smallest, estimate = (k−1)·2^60 / h_(k)  (Bar-Yossef et al. 2002;
Beyer et al. SIGMOD'07 unbiased form). If a group has < k distinct
hashes the sketch is exact. Standard error ≈ 1/√(k−2) (~3% at k=1024).

Scale note: the relational form below dedupes hashes (one map-side
combinable aggregation — the same shuffle exact distinct needs) and
then rank-filters to k per group; its win over exact distinct is the
bounded *output* and bounded downstream state, and the sketch column
can be unioned/merged across partitions of a table (min-merge is
associative). For a no-dedup-shuffle variant at extreme scale, fold the
k-min heap per partition with a pandas UDAF and merge — the estimator
and oracle stay identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from lightsaber_spark.functions.dedup import shingle_hash

TWO60 = 1 << 60


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 1024,
    out_col: str = "n_distinct_kmv",
) -> DataFrame:
    """Per-group KMV distinct-count estimate (exact below k).

    Returns ``(*group_cols, out_col: bigint)``. The estimate is
    computed in exact integer arithmetic — ``floor((k−1)·2^60 / h_k)``
    via decimal mod/div (no float), so DuckDB's HUGEINT ``//`` twin
    matches bit-for-bit.
    """
    groups = list(group_cols)
    d = df.select(
        *groups, shingle_hash(F.col(value_col).cast("string")).alias("_h")
    ).distinct()
    w = Window.partitionBy(*groups).orderBy("_h") if groups else Window.orderBy("_h")
    ranked = d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    # A = (k-1)·2^60 exceeds bigint → decimal(38,0); floor division done
    # as (A - A % h) / h, all exact decimal ops (CLAUDE.md lit gotcha)
    a_lit = F.expr(f"CAST('{(k - 1) * TWO60}' AS DECIMAL(38,0))")
    est = (
        ranked.groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("_nk"), F.max("_h").alias("_hk"))
        .withColumn(
            out_col,
            F.when(F.col("_nk") < k, F.col("_nk").cast("bigint")).otherwise(
                ((a_lit - a_lit % F.col("_hk")) / F.col("_hk")).cast("bigint")
            ),
        )
        .select(*groups, out_col)
    )
    return est


def kmv_oracle_sql(
    table_expr: str,
    group_cols: Sequence[str],
    value_expr: str,
    k: int = 1024,
    out_col: str = "n_distinct_kmv",
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hash, same integer
    floor division via HUGEINT) for embedding in oracle queries."""
    groups = ", ".join(group_cols)
    part = f"PARTITION BY {groups} " if group_cols else ""
    a = (k - 1) * TWO60
    sel_groups = f"{groups}, " if group_cols else ""
    return f"""
    WITH _d AS (
      SELECT DISTINCT {sel_groups}('0x'||substr(md5(CAST({value_expr} AS VARCHAR)),1,15))::BIGINT AS _h
      FROM {table_expr}
    ),
    _r AS (
      SELECT {sel_groups}_h,
             row_number() OVER ({part}ORDER BY _h) AS _rn
      FROM _d
    )
    SELECT {sel_groups}
           CASE WHEN count(*) < {k} THEN count(*)
                ELSE (({a}::HUGEINT) // max(_h)::HUGEINT)::BIGINT
           END AS {out_col}
    FROM _r WHERE _rn <= {k}
    {"GROUP BY " + groups if group_cols else ""}
    """
