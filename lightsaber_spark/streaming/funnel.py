"""Incremental ordered-funnel over a stream (CEP-lite).

The batch funnel (``pipeline_queries.q_funnel``) recomputes the
first-qualifying-event chain per stage from scratch; on a stream the
same semantics fold incrementally: per user, keep the earliest
qualifying timestamp of each stage (stage k qualifies when it is the
first stage-k event strictly after — and within ``step_sec`` of — the
user's stage-(k−1) time). One ``applyInPandasWithState`` keyed
stateful operator; non-stage event types are filtered before the
shuffle and state exists only for users who entered the funnel —
O(n_stages) longs each, independent of event volume: the state-bound
shape streaming CEP needs at 100 TB.

In-order model: like every streaming operator here (SURVEY §2.9, the
reference's in-order assumption), per-user event time must not regress
across micro-batches; within a batch rows are sorted by event time.
On an in-order stream the final emitted row per user equals the batch
chain exactly (both pick the minimal qualifying event per stage —
pinned by the batch-equivalence test).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def streaming_funnel(
    stream: DataFrame,
    ts_col: str,
    user_col: str,
    type_col: str,
    stages: Sequence[str],
    step_sec: int,
) -> DataFrame:
    """Per-user funnel state updates: emits ``(user, stage_reached,
    t0..t{n-1})`` (epoch µs, null for unreached stages) whenever a
    user's state advances; the row with the largest ``stage_reached``
    per user is their final funnel position. Use output mode
    ``update`` (or ``append`` with availableNow replay and a
    last-row-per-user read)."""
    stages = list(stages)
    n = len(stages)
    if n < 2:
        raise ValueError("a funnel needs at least 2 stages")
    if len(set(stages)) != n:
        raise ValueError(
            "stage event types must be distinct (a repeated type would "
            "silently map to its last stage only)"
        )
    step_us = step_sec * 1_000_000

    out_schema = StructType(
        [
            # key keeps its SOURCE type — a hardcoded LongType would
            # crash string user ids at the Arrow boundary (the exact
            # key-typing class fixed in sessions/order_violations,
            # commits aa44a58/00efbc0; r12 review found it here too)
            StructField(user_col, stream.schema[user_col].dataType),
            StructField("stage_reached", LongType()),
        ]
        + [StructField(f"t{j}", LongType()) for j in range(n)]
    )
    state_schema = StructType([StructField(f"t{j}", LongType()) for j in range(n)])
    stage_idx = {s: j for j, s in enumerate(stages)}

    def fn(key, pdf_iter, state):
        st = list(state.get) if state.exists else [None] * n
        changed = False
        # a group arrives as MULTIPLE Arrow chunks in shuffle order —
        # concat before the sort, or cross-chunk out-of-order events
        # would be folded against a half-built state (per-chunk sorting
        # alone breaks the in-batch ordering contract for any user
        # with more events than one Arrow batch)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            ts_us = (pdf[ts_col].astype("int64") // 1000).to_numpy()
            types = pdf[type_col].to_numpy()
            for t, ty in zip(ts_us, types):
                j = stage_idx.get(ty)
                if j is None or st[j] is not None:
                    continue
                if j == 0:
                    st[0] = int(t)
                    changed = True
                elif st[j - 1] is not None and st[j - 1] < t <= st[j - 1] + step_us:
                    st[j] = int(t)
                    changed = True
        if changed:
            state.update(tuple(st))
        if not changed:
            yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
            return
        reached = 0
        for v in st:
            if v is None:
                break
            reached += 1
        yield pd.DataFrame(
            [[key[0], reached, *st]], columns=[f.name for f in out_schema.fields]
        )

    # pre-filter to stage events: non-stage types (the vast majority of
    # a real event stream) never reach the shuffle or the state store,
    # and combined with the update-only-on-change rule above, state
    # exists only for users who actually entered the funnel
    return (
        stream.select(user_col, ts_col, type_col)
        # isin also drops null types; a null ts would reach pandas as
        # NaT and astype('int64') poisons the fold (review finding)
        .filter(F.col(type_col).isin(stages) & F.col(ts_col).isNotNull())
        .groupBy(user_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", "NoTimeout")
    )


def funnel_final_positions(emitted: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Reduce a funnel update log to each user's final position (the
    emission with the largest stage_reached — state only ever grows)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col("stage_reached").desc())
    return (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
