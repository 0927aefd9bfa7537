"""Sequence packing for LLM pretraining pipelines.

The concat-and-chunk assembly step: documents in a deterministic order
are concatenated into one token stream and cut into fixed-length
context windows. The hard part at scale is the global running sum of
token counts — a naive ``Window.orderBy(id)`` sorts the corpus into ONE
partition. Here the cumulative pass is chunk-parallel, the same
distributed prefix-sum shape as ``operators/window_agg._sliding_prefix``
(reference analog: LightSaber's parallel window merging,
``src/utils/WindowOperations``-adjacent; SIGMOD'20 §5):

1. range-partition by id into ``n_chunks`` ordered chunks;
2. per-chunk token totals — a tiny ``n_chunks``-row relation;
3. exclusive chunk offsets via a window over that tiny relation
   (single-partition, but over n_chunks rows, not the corpus — lazy,
   no driver action);
4. intra-chunk running sums partitioned by chunk (parallel), plus the
   broadcast chunk offset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    ctx_len: int,
    token_count_col: str,
    id_col: str = "doc_id",
    n_chunks: int = 64,
    order_col=None,
) -> DataFrame:
    """Assign each document its place in the packed token stream.

    Returns ``(id_col, n_tokens, tok_offset, seq_first, seq_last)``:
    ``tok_offset`` = tokens before this document in stream order,
    ``seq_first``/``seq_last`` = the first/last ctx-window index the
    document lands in (a document spans multiple sequences when it
    crosses a ``ctx_len`` boundary). Zero-token documents are dropped
    (they occupy no stream position).

    Stream order defaults to ``id_col``; pass ``order_col`` (a Column,
    e.g. a 60-bit md5 of the id — see the shuffled-packing query) to
    pack in a deterministic SHUFFLED order, the standard pretraining
    practice (adjacent corpus documents are correlated; hashing the
    order decorrelates batches while staying a pure function of the
    data). ``id_col`` stays the tiebreaker so equal order keys are
    stable.

    Deterministic: a pure function of (order, token counts) — stable
    under partitioning and retries, reproducible in a one-line SQL
    window oracle."""
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    ordered = (
        df.select(
            F.col(id_col),
            F.col(token_count_col).cast("bigint").alias("n_tokens"),
        )
        if order_col is None
        else df.select(
            F.col(id_col),
            F.col(token_count_col).cast("bigint").alias("n_tokens"),
            order_col.alias("_ord"),
        )
    )
    sort_cols = [id_col] if order_col is None else ["_ord", id_col]
    # `_chunk` is spark_partition_id() after a range exchange, and `base`
    # feeds TWO subplans (chunk totals + the final join). Range-boundary
    # SAMPLING is nondeterministic across separate instantiations, so the
    # chunk ids the totals were computed under must be the chunk ids the
    # join sees: pin one materialization with a lazy localCheckpoint —
    # both consumers then read the same checkpointed partitions instead
    # of relying on ReuseExchange to deduplicate the scan. (Lazy: nothing
    # runs at build time; on executor loss the job fails rather than
    # silently recomputing with different boundaries.)
    base = (
        ordered.filter(F.col("n_tokens") > 0)
        .repartitionByRange(n_chunks, *sort_cols)
        .withColumn("_chunk", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = base.groupBy("_chunk").agg(F.sum("n_tokens").alias("_chunk_total"))
    w_chunks = Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_chunk",
        F.coalesce(F.sum("_chunk_total").over(w_chunks), F.lit(0)).alias("_chunk_off"),
    )
    w_in = Window.partitionBy("_chunk").orderBy(*sort_cols)
    packed = (
        base.join(F.broadcast(offsets), "_chunk")
        .withColumn(
            "tok_offset",
            F.col("_chunk_off") + F.sum("n_tokens").over(w_in) - F.col("n_tokens"),
        )
    )
    return packed.select(
        id_col,
        "n_tokens",
        "tok_offset",
        F.expr(f"tok_offset div {ctx_len}").alias("seq_first"),
        F.expr(f"(tok_offset + n_tokens - 1) div {ctx_len}").alias("seq_last"),
    )
