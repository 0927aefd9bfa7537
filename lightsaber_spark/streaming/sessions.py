"""Session windows.

The reference declares SESSION windows but never executes them
(``src/utils/WindowDefinition.h:14,55-58``; no other source file
references SESSION — SURVEY.md §1.4). Here they are real, via Spark's
``session_window`` (works in both batch and Structured Streaming):
rows closer than ``gap`` seconds (per key) merge into one session.

Session identity: ``session_start_us``/``session_end_us`` as exact
integer microseconds (bigint) — session boundaries inherit event-time
precision, unlike the epoch-aligned bigint-second starts of fixed
windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from lightsaber_spark.operators.window_agg import AggSpec, _agg_exprs, _check_aggs


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap_sec: int,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Aggregate per session (gap-separated bursts of events).

    Spark merge rule: an event extends the current session while
    ``ts < prev_session_end`` where ``end = last_ts + gap`` — i.e. a
    gap of exactly ``gap_sec`` starts a new session. Output:
    ``session_start_us``, ``session_end_us`` (bigint µs), keys, aggs.
    """
    _check_aggs(aggs)
    keys = list(keys)
    w = F.session_window(F.col(ts_col), f"{gap_sec} seconds")
    return (
        df.groupBy(w.alias("_sw"), *keys)
        .agg(*_agg_exprs(aggs))
        .select(
            F.unix_micros(F.col("_sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("_sw.end")).alias("session_end_us"),
            *keys,
            *[F.col(a) for _, _, a in aggs],
        )
    )
