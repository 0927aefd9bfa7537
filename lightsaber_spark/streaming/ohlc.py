"""Streaming OHLC bars: open/high/low/close per event-time window.

Streaming twin of the staged batch query
(``staged_queries.ohlc_bars_by_type``). The batch side selects
open/close by row_number over (ts, event_id); a streaming stateful
aggregation cannot rank, but min/max over a STRUCT compare
lexicographically, so ``min(struct(ts, event_id, value)).value`` IS
the value at the earliest (ts, event_id) — the same deterministic
total order, expressed as an incrementally-mergeable aggregate. State
per open window is two structs + two doubles + a count, regardless of
stream volume; native ``F.window`` keys the state store so watermark
GC applies.

Equivalence with the batch query is pinned in
tests/test_streaming_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_ohlc(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    size_sec: int,
    keys: tuple[str, ...] = (),
    watermark: str = "0 seconds",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(window_start, keys..., n, open_value, close_value, high_value,
    low_value) per tumbling event-time window over a stream.
    ``tiebreak_col`` orders equal-timestamp events deterministically
    (review finding: it was a hardcoded ``event_id`` schema
    requirement the signature never declared)."""
    s = stream.withWatermark(ts_col, watermark)
    first = F.min(
        F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(value_col))
    )
    last = F.max(
        F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(value_col))
    )
    return (
        s.groupBy(
            F.window(F.col(ts_col), f"{size_sec} seconds").alias("window"),
            *keys,
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            first.getField(value_col).alias("open_value"),
            last.getField(value_col).alias("close_value"),
            F.max(value_col).alias("high_value"),
            F.min(value_col).alias("low_value"),
        )
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            *keys,
            "n",
            "open_value",
            "close_value",
            "high_value",
            "low_value",
        )
    )
