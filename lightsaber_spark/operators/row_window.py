"""Count-based (ROW_BASED) windows.

Reference: ``src/utils/WindowDefinition.h:13`` — ROW_BASED measure;
used by LRB2/LRB3 stage 2 (row window 1024/1024,
``test/.../LRB2.cpp:22-111``). The reference gets a total row order for
free (single-node in-order stream, ``README.md:16``); on a cluster a
global row index is the expensive primitive, so we implement it with the
standard two-pass bucket-offset technique instead of a single-partition
``Window.orderBy`` (which would serialize 100 TB through one task).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from lightsaber_spark.operators.window_agg import AggSpec, _agg_exprs, _check_aggs


def with_global_row_index(
    df: DataFrame,
    order_by: Sequence[str],
    bucket_expr: Column | None = None,
    index_col: str = "_row_index",
) -> DataFrame:
    """Add a 0-based global row index under a total order, scalably.

    Two-pass bucket-offset scheme:
      1. rows get a per-bucket rank (``row_number`` partitioned by a
         coarse bucket derived from the leading order column — each
         bucket sorts independently, no global sort);
      2. bucket counts (tiny: one row per bucket) are cumulated into
         offsets and broadcast-joined back.

    ``bucket_expr`` must be a monotone non-decreasing function of the
    order prefix (default: day-truncation of the first order column,
    which must be a timestamp). Skewed buckets degrade to the skew
    handling of AQE; choose finer buckets for hot time ranges.
    """
    order_cols = [F.col(c) for c in order_by]
    if bucket_expr is None:
        # exact integer-µs day bucket via epoch_us/_exact_bucket — the
        # old cast('double')/86400 form was the one remaining banned
        # float-epoch site and THROWS on TIMESTAMP_NTZ/Date order
        # columns (r12 review; same crash class theta_join fixed in
        # r11). Same buckets for every epoch-nonneg timestamp.
        from lightsaber_spark.operators.window_agg import _exact_bucket, epoch_us

        bucket_expr = _exact_bucket(epoch_us(df, order_by[0]), 86400)
    b = df.withColumn("_bucket", bucket_expr)
    rank_in = F.row_number().over(
        Window.partitionBy("_bucket").orderBy(*order_cols)
    )
    b = b.withColumn("_rank_in", rank_in)

    # DELIBERATE double reference without persist (reviewed): the
    # counts branch prunes to the single order/bucket column, so the
    # second pass is a column-pruned scan with pushdown — at corpus
    # scale that is cheaper and safer than persisting the full-width
    # input (the corpus-sized-cache anti-pattern the passage index
    # replaced). The CLAUDE.md self-join persist rule targets
    # non-trivial DERIVED subplans; this re-reads the source.
    counts = b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_bucket", "_offset")

    return (
        b.join(F.broadcast(offsets), "_bucket")
        .withColumn(index_col, (F.col("_offset") + F.col("_rank_in") - 1).cast("bigint"))
        .drop("_bucket", "_rank_in", "_offset")
    )


def row_window_agg(
    df: DataFrame,
    order_by: Sequence[str],
    size: int,
    slide: int | None,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = (),
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Count-based windowed aggregation over a total order.

    Tumbling (slide==size): window id = floor(index / size).
    Sliding: each row joins its size/slide containing windows via the
    same pane/explode scheme as range windows (window w covers rows
    [w*slide, w*slide + size)).

    Output: ``window_id`` (bigint, = start row index / slide), keys,
    aggregates. Matches the reference's semantics of cutting the stream
    every `slide` rows (``WindowDefinition.h:44-53``).
    """
    _check_aggs(aggs)
    slide = slide or size
    if slide > size:
        # same rule as windowed_agg: hopping-with-gaps is not in the
        # reference's semantics — and the sliding explode below would
        # hit w_min > w_max for gap rows, a runtime
        # 'Illegal sequence boundaries' crash (r12 review)
        raise ValueError("slide > size (hopping-with-gaps) not in reference semantics")
    keys = list(keys)
    idx = with_global_row_index(df, order_by, bucket_expr)

    if slide == size:
        win = (F.floor(F.col("_row_index") / size)).cast("bigint").alias("window_id")
        return (
            idx.groupBy(win, *keys)
            .agg(*_agg_exprs(aggs))
            .select("window_id", *keys, *[F.col(a) for _, _, a in aggs])
        )

    # sliding: row i belongs to windows w with w*slide <= i < w*slide+size
    i = F.col("_row_index")
    w_max = F.floor(i / slide).cast("bigint")
    w_min = F.greatest(
        F.lit(0).cast("bigint"), (-F.floor((-(i - size + 1)) / slide)).cast("bigint")
    )
    exploded = idx.withColumn(
        "window_id", F.explode(F.sequence(w_min, w_max, F.lit(1).cast("bigint")))
    )
    return (
        exploded.groupBy("window_id", *keys)
        .agg(*_agg_exprs(aggs))
        .select("window_id", *keys, *[F.col(a) for _, _, a in aggs])
    )


def keyed_row_window_agg(
    df: DataFrame,
    order_by: Sequence[str],
    size: int,
    aggs: Sequence[AggSpec],
    keys: Sequence[str],
) -> DataFrame:
    """Tumbling count windows counted **independently per key** — the
    scalable row-window shape (each key's stream is its own in-order
    sequence; state shards by key). Batch twin of
    ``streaming.row_windows.streaming_row_window_agg(keys=...)``.

    Per-key ``row_number`` partitions by key — no global sort, no
    two-pass index needed; skew bounded by the hottest key.

    Output: ``*keys``, ``window_id`` (0-based per key), aggregates.
    """
    _check_aggs(aggs)
    keys = list(keys)
    rank = F.row_number().over(
        Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    )
    idx = df.withColumn("_rk", rank)
    win = (F.floor((F.col("_rk") - 1) / size)).cast("bigint").alias("window_id")
    return (
        idx.groupBy(*keys, win)
        .agg(*_agg_exprs(aggs))
        .select(*keys, "window_id", *[F.col(a) for _, _, a in aggs])
    )
