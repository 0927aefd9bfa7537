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
An EMPTY relation plans as ``plain`` with 0 bits (nothing to encode)
on both engines.

``runs`` is computed DISTRIBUTED: rows are chunked on the order column
(``chunk = order DIV chunk_rows`` — integer division, exact at any
magnitude) and value-change counts are summed per chunk (window
partitioned by chunk — parallel, never a global sort). Cross-chunk
boundary changes are not counted — an undercount of at most n_chunks,
identical on both engines, irrelevant to the decision at any realistic
chunk size.

ONE PASS for all columns: a single projection carries every column's
run flag (all lags share one window spec → one shuffle), a single
global aggregate computes every column's (d, runs, lo, hi), and the
per-column rows are cheap selects from that one stats row.
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
    """One row per column in ``cols`` (must be bigint): ``(column_name,
    codec, est_bits, plain_bits)`` — the winning codec by the cost
    model above, ties broken in CODECS order (base_delta < dictionary
    < rle < plain)."""
    chunk = F.expr(f"CAST({order_col} DIV {chunk_rows} AS BIGINT)").alias("_chunk")
    # alias the order column: selecting it alongside a cols entry of
    # the same name made every later reference ambiguous
    # (compression_plan(df, ['event_id', ...], 'event_id') threw
    # AnalysisException — r12 review; monotone ids are this module's
    # own headline base-delta candidates)
    base = df.select(
        chunk, F.col(order_col).alias("_ord"), *[F.col(c) for c in cols]
    )
    w = Window.partitionBy("_chunk").orderBy("_ord")
    flags = [
        F.when(
            F.lag(col).over(w).isNull() | (F.lag(col).over(w) != F.col(col)), 1
        )
        .otherwise(0)
        .alias(f"_r_{col}")
        for col in cols
    ]
    per = base.select("*", *flags)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for col in cols:
        aggs += [
            F.count_distinct(col).cast("bigint").alias(f"d_{col}"),
            F.sum(f"_r_{col}").cast("bigint").alias(f"runs_{col}"),
            F.min(col).cast("bigint").alias(f"lo_{col}"),
            F.max(col).cast("bigint").alias(f"hi_{col}"),
        ]
    stats = per.agg(*aggs)

    # one row per column via explode-of-structs over the SINGLE stats
    # row — the r13 fix for the original per-column union of selects,
    # which re-executed the aggregate (and re-SCANNED the input) once
    # per column: AQE exchange reuse did not kick in across the union
    # branches in foreachBatch micro-batches, confirmed by
    # numInputRows = n_cols × batch rows in the streaming re-planner
    entries = []
    for col in cols:
        n = F.col("n")
        d, runs = F.col(f"d_{col}"), F.col(f"runs_{col}")
        lo, hi = F.col(f"lo_{col}"), F.col(f"hi_{col}")
        code_bits = F.when(d <= 1, F.lit(1)).otherwise(_bits(d - 1))
        plain = 64 * n
        dictionary = n * code_bits + 64 * d
        rle = 96 * runs
        # hi − lo overflows bigint when the column spans both sign
        # extremes; base-delta is inapplicable (NULL) past 2^62 — the
        # double-compare guard is overflow-safe and int64→double
        # rounding is exactly specified on both engines
        range_ok = (hi.cast("double") - lo.cast("double")) < float(1 << 62)
        delta = F.when(hi == lo, F.lit(64)).when(
            range_ok, F.lit(64) + n * _bits(hi - lo)
        )
        best = F.least(delta, dictionary, rle, plain)
        # n = 0: every stat is NULL/0 — plan 'plain' with 0 bits (both
        # engines; without the guard the NULL propagation differs)
        codec = F.when(n == 0, F.lit("plain")).otherwise(
            F.when(delta.isNotNull() & (delta == best), F.lit("base_delta"))
            .when(dictionary == best, F.lit("dictionary"))
            .when(rle == best, F.lit("rle"))
            .otherwise(F.lit("plain"))
        )
        est = F.when(n == 0, F.lit(0)).otherwise(best)
        entries.append(
            F.struct(
                F.lit(col).alias("column_name"),
                codec.alias("codec"),
                est.cast("bigint").alias("est_bits"),
                plain.cast("bigint").alias("plain_bits"),
            )
        )
    return stats.select(F.explode(F.array(*entries)).alias("_e")).select("_e.*")


def compression_replan(
    df: DataFrame,
    cols: list[str],
    order_col: str,
    batch_rows: int,
    chunk_rows: int = 1 << 16,
) -> DataFrame:
    """Runtime-adaptive RE-planning — the reference's
    ``CompressionMonitor`` loop (``src/monitors/CompressionMonitor.cpp``
    re-decides codecs as column statistics drift mid-stream), expressed
    relationally: the ordered stream is segmented into micro-batches
    (``batch_seq = order DIV batch_rows``), the full cost model runs
    per batch, and ``flipped`` marks every batch where a column's
    winning codec CHANGED from the previous batch — the codec-flip
    events the reference's monitor emits.

    One row per (batch_seq, column): ``(batch_seq, column_name, codec,
    est_bits, plain_bits, flipped)``. Single pass: one grouped
    aggregate carries every column's stats, an explode of per-column
    structs avoids re-executing the aggregate per column, and the flip
    flag is one tiny window over the plan rows themselves (O(batches ×
    columns), nothing data-sized). Unlike :func:`compression_plan`, an
    empty relation yields ZERO rows (no batches → no plans) — grouped
    aggregation semantics, identical on both engines."""
    batch = F.expr(f"CAST({order_col} DIV {batch_rows} AS BIGINT)").alias(
        "_batch_seq"
    )
    chunk = F.expr(f"CAST({order_col} DIV {chunk_rows} AS BIGINT)").alias("_chunk")
    base = df.select(
        batch, chunk, F.col(order_col).alias("_ord"), *[F.col(c) for c in cols]
    )
    # runs are chunked WITHIN a batch: partition by (batch, chunk) so a
    # chunk straddling a batch boundary never leaks runs across batches
    w = Window.partitionBy("_batch_seq", "_chunk").orderBy("_ord")
    flags = [
        F.when(
            F.lag(col).over(w).isNull() | (F.lag(col).over(w) != F.col(col)), 1
        )
        .otherwise(0)
        .alias(f"_r_{col}")
        for col in cols
    ]
    per = base.select("*", *flags)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for col in cols:
        aggs += [
            F.count_distinct(col).cast("bigint").alias(f"d_{col}"),
            F.sum(f"_r_{col}").cast("bigint").alias(f"runs_{col}"),
            F.min(col).cast("bigint").alias(f"lo_{col}"),
            F.max(col).cast("bigint").alias(f"hi_{col}"),
        ]
    stats = per.groupBy("_batch_seq").agg(*aggs)

    entries = []
    for col in cols:
        n = F.col("n")
        d, runs = F.col(f"d_{col}"), F.col(f"runs_{col}")
        lo, hi = F.col(f"lo_{col}"), F.col(f"hi_{col}")
        code_bits = F.when(d <= 1, F.lit(1)).otherwise(_bits(d - 1))
        plain = 64 * n
        dictionary = n * code_bits + 64 * d
        rle = 96 * runs
        range_ok = (hi.cast("double") - lo.cast("double")) < float(1 << 62)
        delta = F.when(hi == lo, F.lit(64)).when(
            range_ok, F.lit(64) + n * _bits(hi - lo)
        )
        best = F.least(delta, dictionary, rle, plain)
        codec = (
            F.when(delta.isNotNull() & (delta == best), F.lit("base_delta"))
            .when(dictionary == best, F.lit("dictionary"))
            .when(rle == best, F.lit("rle"))
            .otherwise(F.lit("plain"))
        )
        entries.append(
            F.struct(
                F.lit(col).alias("column_name"),
                codec.alias("codec"),
                best.cast("bigint").alias("est_bits"),
                plain.cast("bigint").alias("plain_bits"),
            )
        )
    out = stats.select(
        F.col("_batch_seq").alias("batch_seq"),
        F.explode(F.array(*entries)).alias("_e"),
    ).select("batch_seq", "_e.*")
    wf = Window.partitionBy("column_name").orderBy("batch_seq")
    prev = F.lag("codec").over(wf)
    return out.withColumn(
        "flipped",
        F.when(prev.isNotNull() & (prev != F.col("codec")), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint"),
    )


def compression_replan_oracle_sql(
    src_sql: str,
    cols: list[str],
    order_col: str,
    batch_rows: int,
    chunk_rows: int = 1 << 16,
) -> str:
    """DuckDB twin of :func:`compression_replan` (same segmentation,
    same per-batch cost model, same flip definition)."""
    parts = []
    for col in cols:
        parts.append(f"""
    SELECT batch_seq, '{col}' AS column_name,
           CASE WHEN delta <= dict AND delta <= rle AND delta <= plain THEN 'base_delta'
                WHEN dict <= rle AND dict <= plain THEN 'dictionary'
                WHEN rle <= plain THEN 'rle'
                ELSE 'plain' END AS codec,
           CAST(least(delta, dict, rle, plain) AS BIGINT) AS est_bits,
           CAST(plain AS BIGINT) AS plain_bits
    FROM (
      SELECT batch_seq, n, 64 * n AS plain,
             n * code_bits + 64 * d AS dict,
             96 * runs AS rle,
             CASE WHEN hi = lo THEN 64
                  WHEN CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)
                         < 4611686018427387904.0
                  THEN 64 + n * length(bin(hi - lo))
                  ELSE NULL END AS delta
      FROM (
        SELECT batch_seq, count(*) AS n, count(DISTINCT {col}) AS d,
               sum(r) AS runs, min({col}) AS lo, max({col}) AS hi,
               CASE WHEN count(DISTINCT {col}) <= 1 THEN 1
                    ELSE length(bin(count(DISTINCT {col}) - 1)) END AS code_bits
        FROM (
          SELECT batch_seq, {col},
                 CASE WHEN lag({col}) OVER w IS NULL
                        OR lag({col}) OVER w <> {col} THEN 1 ELSE 0 END AS r
          FROM (SELECT {col}, {order_col},
                       {order_col} // {batch_rows} AS batch_seq,
                       {order_col} // {chunk_rows} AS _chunk FROM {src_sql})
          WINDOW w AS (PARTITION BY batch_seq, _chunk ORDER BY {order_col})
        )
        GROUP BY batch_seq
      )
    )""")
    inner = "\n    UNION ALL".join(parts)
    return f"""
    SELECT batch_seq, column_name, codec, est_bits, plain_bits,
           CAST(CASE WHEN lag(codec) OVER
                       (PARTITION BY column_name ORDER BY batch_seq)
                       IS NOT NULL
                      AND lag(codec) OVER
                       (PARTITION BY column_name ORDER BY batch_seq)
                       <> codec
                THEN 1 ELSE 0 END AS BIGINT) AS flipped
    FROM ({inner})
    """


def compression_plan_oracle_sql(
    src_sql: str,
    cols: list[str],
    order_col: str,
    chunk_rows: int = 1 << 16,
) -> str:
    """DuckDB twin of :func:`compression_plan` (same cost model, same
    chunked runs count, same tie order, same empty-input plan)."""
    parts = []
    for col in cols:
        parts.append(f"""
    SELECT '{col}' AS column_name,
           CASE WHEN n = 0 THEN 'plain'
                WHEN delta <= dict AND delta <= rle AND delta <= plain THEN 'base_delta'
                WHEN dict <= rle AND dict <= plain THEN 'dictionary'
                WHEN rle <= plain THEN 'rle'
                ELSE 'plain' END AS codec,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE least(delta, dict, rle, plain) END AS BIGINT) AS est_bits,
           CAST(plain AS BIGINT) AS plain_bits
    FROM (
      SELECT n, 64 * n AS plain,
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
