"""Adaptive per-column compression planning — the relational form of
Scabbard's stats-driven codec selection for persisted stream state
(reference: ``src/compression/CompressionCodeGenUtils.h:14``,
``Compressor.h:25-75``, ``src/monitors/CompressionMonitor.cpp`` — which
JIT-generates RLE / base-delta / dictionary compressors per column from
observed statistics).

Spark's state store and parquet already compress transparently (SURVEY
§2.9 maps the mechanism to built-ins), so what's worth re-expressing is
the DECISION: from per-column statistics, which codec wins and what is
the estimated size. Everything below is exact integer arithmetic
(bit-widths via binary-string length), so a DuckDB oracle reproduces
the full plan bit-for-bit.

Cost model (bits, deliberately simple and engine-portable):
  plain      64·n
  dictionary n·ceil_log2(d) + 64·d        (code stream + dictionary)
  rle        96·runs                       (64-bit value + 32-bit run)
  base-delta 64 + n·bits(hi − lo)          (base + fixed-width deltas;
             inapplicable — NULL — when the range reaches 2^62, which
             also guards the hi − lo bigint overflow)

``runs`` is computed DISTRIBUTED: rows are chunked on the order column
(``chunk = order DIV chunk_rows``) and value-change counts are summed
per chunk (window partitioned by chunk — parallel, never a global
sort). Cross-chunk boundary changes are not counted — an undercount of
at most n_chunks, identical on both engines, irrelevant to the
decision at any realistic chunk size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CODECS = ("base_delta", "dictionary", "rle", "plain")


def _bits(c):
    """bit width of a non-negative bigint: length(bin(x))."""
    return F.length(F.bin(c)).cast("bigint")


def compression_plan(
    df: DataFrame,
    cols: list[str],
    order_col: str,
    chunk_rows: int = 1 << 16,
) -> DataFrame:
    """One row per column in ``cols`` (must be bigint, non-negative
    deltas assumed via hi−lo): ``(column_name, codec, est_bits,
    plain_bits)`` — the winning codec by the cost model above, ties
    broken in CODECS order (base_delta < dictionary < rle < plain)."""
    chunk = (F.col(order_col) / chunk_rows).cast("bigint").alias("_chunk")
    plans = []
    for col in cols:
        c = F.col(col)
        w = Window.partitionBy("_chunk").orderBy(order_col)
        runs_flag = F.when(
            F.lag(col).over(w).isNull() | (F.lag(col).over(w) != c), 1
        ).otherwise(0)
        per = df.select(chunk, F.col(order_col), c).withColumn("_r", runs_flag)
        stats = per.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct(col).cast("bigint").alias("d"),
            F.sum("_r").cast("bigint").alias("runs"),
            F.min(col).cast("bigint").alias("lo"),
            F.max(col).cast("bigint").alias("hi"),
        )
        n, d, runs = F.col("n"), F.col("d"), F.col("runs")
        code_bits = F.when(d <= 1, F.lit(1)).otherwise(_bits(d - 1))
        plain = 64 * n
        dictionary = n * code_bits + 64 * d
        rle = 96 * runs
        # hi − lo overflows bigint when the column spans both sign
        # extremes; base-delta is inapplicable (NULL) past 2^62 — the
        # double-compare guard is overflow-safe and int64→double
        # rounding is exactly specified on both engines
        range_ok = (
            F.col("hi").cast("double") - F.col("lo").cast("double")
        ) < float(1 << 62)
        delta = (
            F.when(F.col("hi") == F.col("lo"), F.lit(64))
            .when(range_ok, F.lit(64) + n * _bits(F.col("hi") - F.col("lo")))
        )
        best = F.least(delta, dictionary, rle, plain)
        codec = (
            F.when(delta.isNotNull() & (delta == best), F.lit("base_delta"))
            .when(dictionary == best, F.lit("dictionary"))
            .when(rle == best, F.lit("rle"))
            .otherwise(F.lit("plain"))
        )
        plans.append(
            stats.select(
                F.lit(col).alias("column_name"),
                codec.alias("codec"),
                best.cast("bigint").alias("est_bits"),
                plain.cast("bigint").alias("plain_bits"),
            )
        )
    out = plans[0]
    for p in plans[1:]:
        out = out.unionAll(p)
    return out


def compression_plan_oracle_sql(
    src_sql: str,
    cols: list[str],
    order_col: str,
    chunk_rows: int = 1 << 16,
) -> str:
    """DuckDB twin of :func:`compression_plan` (same cost model, same
    chunked runs count, same tie order)."""
    parts = []
    for col in cols:
        parts.append(f"""
    SELECT '{col}' AS column_name,
           CASE WHEN delta <= dict AND delta <= rle AND delta <= plain THEN 'base_delta'
                WHEN dict <= rle AND dict <= plain THEN 'dictionary'
                WHEN rle <= plain THEN 'rle'
                ELSE 'plain' END AS codec,
           CAST(least(delta, dict, rle, plain) AS BIGINT) AS est_bits,
           CAST(plain AS BIGINT) AS plain_bits
    FROM (
      SELECT 64 * n AS plain,
             n * code_bits + 64 * d AS dict,
             96 * runs AS rle,
             CASE WHEN hi = lo THEN 64
                  WHEN CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)
                         < 4611686018427387904.0
                  THEN 64 + n * length(bin(hi - lo))
                  ELSE NULL END AS delta
      FROM (
        SELECT count(*) AS n, count(DISTINCT {col}) AS d,
               sum(r) AS runs, min({col}) AS lo, max({col}) AS hi,
               CASE WHEN count(DISTINCT {col}) <= 1 THEN 1
                    ELSE length(bin(count(DISTINCT {col}) - 1)) END AS code_bits
        FROM (
          SELECT {col},
                 CASE WHEN lag({col}) OVER w IS NULL
                        OR lag({col}) OVER w <> {col} THEN 1 ELSE 0 END AS r
          FROM (SELECT {col}, {order_col},
                       {order_col} // {chunk_rows} AS _chunk FROM {src_sql})
          WINDOW w AS (PARTITION BY _chunk ORDER BY {order_col})
        )
      )
    )""")
    return "\n    UNION ALL".join(parts)
