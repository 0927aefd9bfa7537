"""Streaming empty-window emission (gap fill).

The reference emits EVERY window between the first data point and the
stream head, empty or not (``OperatorKernel.h:3830-3988`` — the batch
twin is ``operators/window_agg.window_spine`` + ``gap_filled``).
Spark's native streaming window aggregation only emits windows that
received rows, so the streaming twin is a stateful op: tumbling
buckets are derived input-side, one state row per key tracks the next
unemitted window start plus the still-open bucket partials, and every
window whose END the watermark has passed is emitted in order —
count 0 / sum NULL for windows no row touched. An event-time timeout
keeps emission flowing when a micro-batch brings no rows for the key.

Relationship to ``stream.streaming_gapfill_count`` (r8): that op is
NEXT-EVENT-driven — a window (and any skipped empties before it)
closes only when a LATER event arrives for the key, so a silent
stream holds its tail forever. This one is WATERMARK-driven with an
event-time timeout: time passage alone drains the gap — the
reference's continuous-emission model (same distinction
``sessions.streaming_sessions_timeout`` draws for session close), and
it carries the exact-cents sum the batch ``gapfill_tumbling_count``
query emits, so the equivalence test compares all three columns.

``keys=`` (r14 verdict #4) shards the op exactly as
``streaming_row_window_agg`` does: one state row and one spine PER
KEY, each spine starting at that key's first event's window — the
form that survives a 100 TB deployment (the global form funnels the
stream through one python partition, the documented round-8 class;
keyed state distributes across executors by hash of the key). Rows
with a NULL key are dropped input-side (the line family's choice —
identity-less rows have no per-entity spine; a NULL key would arrive
in the Arrow state fn as NaN, the CLAUDE.md gotcha).

State is O(open windows) = O(watermark lag / window size) per key,
never O(span): the emitted prefix leaves state immediately.

Import note (CLAUDE.md gotcha): ``pandas as pd`` must be importable
from MODULE globals for pandas type-hint inference under
``from __future__ import annotations``.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

US = 1_000_000


def streaming_gapfill_tumbling(
    stream: DataFrame,
    ts_col: str,
    size_sec: int,
    value_col: str | None = None,
    watermark: str = "0 seconds",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Tumbling windows with empty-window emission: output rows
    ``(*keys, window_start bigint, n bigint, sum_value double|null)``
    for EVERY window start from the (key's) first event's window up to
    the last window closed by the watermark, in order, exactly once
    (append mode). ``value_col`` (integer cents for exactness, the
    repo's money rule) feeds ``sum_value`` (= cents/100.0, NULL when
    n=0 OR when no non-null value landed in the window — SQL ``sum``
    over all-NULL is NULL, so state tracks a per-bucket non-null
    count), mirroring the batch ``gapfill_tumbling_count`` query.
    Without ``keys`` the spine is global (single state key)."""
    keys = list(keys)
    in_fields = {f.name: f for f in stream.schema.fields}
    key_fields = [in_fields[k] for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("window_start", LongType()),
            StructField("n", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    # state: next unemitted window start (sec), parallel arrays of the
    # still-open buckets (starts sec / counts / cent sums / non-null
    # value counts)
    state_schema = StructType(
        [
            StructField("next_start", LongType()),
            StructField("open_starts", ArrayType(LongType())),
            StructField("open_counts", ArrayType(LongType())),
            StructField("open_sums", ArrayType(LongType())),
            StructField("open_nnz", ArrayType(LongType())),
        ]
    )
    size_us = size_sec * US
    out_cols = keys + ["window_start", "n", "sum_value"]

    def fn(key, pdf_iter, state):
        if state.exists:
            next_start, starts, counts, sums, nnzs = state.get
            open_b = {
                int(s): [int(c), int(v), int(z)]
                for s, c, v, z in zip(starts, counts, sums, nnzs)
            }
            next_start = int(next_start)
        else:
            next_start, open_b = None, {}

        for pdf in pdf_iter:
            for w_us, v in zip(pdf["_w_us"], pdf["_v"]):
                s = int(w_us) // size_us * size_sec
                b = open_b.setdefault(s, [0, 0, 0])
                b[0] += 1
                if not pd.isna(v):
                    b[1] += int(v)
                    b[2] += 1
                if next_start is None or s < next_start:
                    next_start = s

        wm_us = state.getCurrentWatermarkMs() * 1000
        rows = []
        # the global form's synthetic _g key is not an output column
        key_prefix = list(key) if keys else []
        if next_start is not None:
            # emit every window whose END the watermark has passed
            while (next_start + size_sec) * US <= wm_us:
                n, cents, nnz = open_b.pop(next_start, (0, 0, 0))
                rows.append(
                    key_prefix
                    + [next_start, n, (cents / 100.0) if nnz else None]
                )
                next_start += size_sec
            state.update(
                (
                    next_start,
                    sorted(open_b),
                    [open_b[s][0] for s in sorted(open_b)],
                    [open_b[s][1] for s in sorted(open_b)],
                    [open_b[s][2] for s in sorted(open_b)],
                )
            )
            # wake up when the watermark passes the next window end,
            # even if no further rows arrive for this key (ms epoch)
            state.setTimeoutTimestamp((next_start + size_sec) * 1000)
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    wm = stream.withWatermark(ts_col, watermark)
    if keys:
        for k in keys:
            wm = wm.filter(F.col(k).isNotNull())
    prepared = wm.select(
        F.col(ts_col),
        *keys,
        *([] if keys else [F.lit(0).cast("bigint").alias("_g")]),
        F.unix_micros(F.col(ts_col)).alias("_w_us"),
        (
            F.col(value_col) if value_col is not None else F.lit(None)
        ).cast("bigint").alias("_v"),
    )
    grouped = prepared.groupBy(*(keys if keys else ["_g"]))
    return grouped.applyInPandasWithState(
        fn, out_schema, state_schema, "append", "EventTimeTimeout"
    )
