"""HyperLogLog distinct-count sketch with exact integer register math.

Reference parity: the reference's approximate-distinct role is covered by
KMV (`functions/sketches.py`); HLL is the industry-standard alternative
(Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm") with strictly smaller state
(m bytes vs k hashes).  The design here makes the *whole* estimate
reproducible by a SQL oracle, bit for bit:

- the hash is the repo-standard 60-bit md5 prefix
  (``('0x'||substr(md5(x),1,15))::BIGINT`` in DuckDB), so both engines
  see identical hashes;
- the register value is the trailing-zero rank of the hash remainder,
  computed with pure integer bit tricks (``bit_count((w & -w) - 1) + 1``)
  — no float, no platform-dependent intrinsics;
- the harmonic-mean denominator is folded as an exact BIGINT
  (``sum(1 << (rho_max - rho))`` ≤ m·2^rho_max = 2^61 < 2^63, with
  ``rho_max = 61 - log2(m)``), never as a float sum
  (a float ``sum(2^-rho)`` spans > 53 bits of magnitude and its
  rounding would be accumulation-order-dependent);
- the only float op is the final ``C / S`` with both operands exactly
  representable — IEEE-754 division is correctly rounded, so Spark and
  DuckDB produce the identical double.

No small-range (linear-counting) correction is applied: it needs
``ln``, which is not correctly rounded and could differ between engines
in the last ulp.  The raw estimator is therefore positively biased for
n ≪ m — callers that need exactness at small n should use KMV
(exact below k) instead; this sketch is the bounded-state choice when
distinct counts are large (the 100 TB case).

Registers max-merge: ``hll_registers`` output from disjoint partitions
combined with ``groupBy(...).max("rho")`` equals the whole-input
registers (pinned in tests/test_staged_queries.py), so the sketch
composes with windowed / incremental aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def rho_max(m: int) -> int:
    """Largest possible register value for bucket count ``m = 2^p``:
    the hash remainder ``w = h div m`` has ``60 - p`` bits, so a
    nonzero ``w`` has at most ``60 - p - 1`` trailing zeros (rho ≤
    ``60 - p``), and ``w == 0`` — all remainder bits zero — is defined
    as ``rho = 61 - p``. The register fold scales by ``2^(rho_max -
    rho)``, so this bound is what keeps every shift non-negative for
    ANY power-of-two m (a fixed 53 would go negative for m < 256)."""
    p = m.bit_length() - 1
    return 61 - p


def _scale(m: int) -> int:
    """``2^rho_max(m)`` — the exact-integer harmonic-mean scale. Total
    denominator ≤ m · 2^rho_max = 2^61 < 2^63, so the BIGINT fold can
    never overflow."""
    return 1 << rho_max(m)


def _alpha(m: int) -> float:
    """Standard HLL bias constant (Flajolet et al. 2007, fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _estimate_const(m: int) -> float:
    """The full numerator ``alpha_m * m^2 * 2^rho_max`` precomputed in
    ONE place (Python) and embedded as the same literal on both
    engines, so the estimate is a single cross-engine-identical
    division."""
    return _alpha(m) * float(m) * float(m) * float(_scale(m))


def _h60(c: Column) -> Column:
    """60-bit md5-prefix hash as bigint — delegates to the single
    repo-standard definition (``dedup.shingle_hash``); a private
    re-implementation of the cross-engine hash invariant would not
    track a future change to it (r12 review)."""
    from lightsaber_spark.functions.dedup import shingle_hash

    return shingle_hash(c.cast("string"))


def hll_bucket_rho(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 256,
) -> DataFrame:
    """Map-side (group..., bucket, rho) rows — the pre-aggregation
    shared by the batch register builder and the streaming windowed
    twin (streaming/sketches.py). Pure expression work, no shuffle."""
    if m <= 0 or m & (m - 1):
        # ValueError, not assert: asserts vanish under python -O and a
        # non-power-of-two m silently biases the estimate (the p =
        # bit_length-1 derivation assumes 2^p buckets; r12 review)
        raise ValueError("m must be a power of two")
    h = _h60(F.col(value_col))
    # `div` (not `/` + cast: Spark's float cast would round) — h ≥ 0 so
    # truncation == floor, matching DuckDB `//`.
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            h.alias("_hll_h"),
        )
        .select(
            *group_cols,
            (F.col("_hll_h") % F.lit(m)).alias("bucket"),
            F.expr(f"_hll_h div {m}").alias("_hll_w"),
        )
    )
    rho = F.when(F.col("_hll_w") == 0, F.lit(rho_max(m))).otherwise(
        F.expr("bit_count((_hll_w & -_hll_w) - 1) + 1")
    )
    return hashed.select(*group_cols, "bucket", rho.alias("rho"))


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 256,
) -> DataFrame:
    """Per-group HLL registers: one row per (group, bucket) with the max
    trailing-zero rank ``rho``. Buckets never observed are absent
    (they contribute rho = 0 at estimate time).

    Pure map-side expression work + one partial-aggregating groupBy —
    the plan is a two-stage HashAggregate, no shuffle beyond the
    (group, bucket) key. State per group is ≤ m rows regardless of
    input size, which is the entire point at 100 TB.
    """
    return (
        hll_bucket_rho(df, group_cols, value_col, m)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    m: int = 256,
    out_col: str = "n_hll",
) -> DataFrame:
    """Fold per-group registers into the raw HLL estimate.

    Emits ``reg_sum`` (the exact BIGINT harmonic-mean denominator,
    including 2^rho_max per empty bucket), ``buckets_seen``, and
    ``out_col`` (the double estimate — one division, cross-engine
    bit-identical).
    """
    r_max = rho_max(m)
    folded = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {r_max} - rho)")).alias(
            "_present"
        ),
        F.count(F.lit(1)).alias("buckets_seen"),
    )
    reg_sum = F.col("_present") + (F.lit(m) - F.col("buckets_seen")) * F.lit(
        _scale(m)
    )
    c = _estimate_const(m)
    return folded.select(
        *group_cols,
        reg_sum.cast("bigint").alias("reg_sum"),
        F.col("buckets_seen").cast("bigint").alias("buckets_seen"),
        (F.lit(c) / reg_sum.cast("double")).alias(out_col),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 256,
    out_col: str = "n_hll",
) -> DataFrame:
    """HLL distinct estimate of ``value_col`` per group — registers then
    fold; see module docstring for the exactness contract."""
    return hll_estimate(
        hll_registers(df, group_cols, value_col, m), group_cols, m, out_col
    )


def hll_oracle_sql(
    table: str,
    group_cols: list[str],
    value_expr: str,
    m: int = 256,
    out_col: str = "n_hll",
) -> str:
    """DuckDB twin of :func:`hll_distinct` — identical md5 hashing,
    identical integer bit tricks, identical single-literal estimate
    constant. ``table`` may be a subquery in parentheses-free form
    (it is wrapped in a CTE)."""
    g = ", ".join(group_cols)
    c = repr(_estimate_const(m))
    r_max = rho_max(m)
    scale = _scale(m)
    return f"""
WITH _hll_in AS (
  SELECT {g}, ('0x'||substr(md5(CAST({value_expr} AS VARCHAR)),1,15))::BIGINT AS h
  FROM {table}
  WHERE {value_expr} IS NOT NULL
),
_hll_reg AS (
  SELECT {g}, h % {m} AS bucket,
         MAX(CASE WHEN h // {m} = 0 THEN {r_max}
             ELSE bit_count(((h // {m}) & -(h // {m})) - 1) + 1 END) AS rho
  FROM _hll_in GROUP BY {g}, bucket
),
_hll_fold AS (
  SELECT {g},
         CAST(SUM(1::BIGINT << ({r_max} - rho)) AS BIGINT) AS _present,
         CAST(COUNT(*) AS BIGINT) AS buckets_seen
  FROM _hll_reg GROUP BY {g}
)
SELECT {g},
       CAST(_present + ({m} - buckets_seen) * {scale} AS BIGINT) AS reg_sum,
       buckets_seen,
       {c} / CAST(_present + ({m} - buckets_seen) * {scale} AS DOUBLE) AS {out_col}
FROM _hll_fold
"""
