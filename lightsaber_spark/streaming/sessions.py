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

    Spark merge rule (pinned empirically by
    ``test_streaming_sessions_exact_gap_boundary_matches_batch``): an
    event extends the current session while ``ts <= prev_session_end``
    where ``end = last_ts + gap`` — a gap of EXACTLY ``gap_sec`` still
    merges; only a strictly larger gap starts a new session. (This
    docstring previously claimed the strict rule — wrong.) Output:
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


def streaming_sessions_timeout(
    stream,
    ts_col: str,
    key_col: str,
    gap_sec: int,
    watermark: str = "0 seconds",
):
    """Streaming session windows that close on EVENT-TIME TIMEOUT: a
    key whose stream goes silent still gets its session emitted once
    the watermark passes ``last_event + gap`` — the piece next-event
    closing (all the other stateful ops here) cannot provide, and the
    production semantics for session analytics over sparse keys.

    State per key: (start_us, last_us, n) plus a registered timeout at
    ``last + gap``. A same-key event after the gap ALSO closes the
    previous session in-state (both paths tested). Output:
    ``(key, session_start_us, session_end_us, n)``, end = last + gap,
    matching the batch ``session_window_agg`` convention. Update mode.

    Watermark caveat (CLAUDE.md): the watermark a micro-batch enforces
    lags one batch, so a timeout fires two batches after the data that
    outdates it — the equivalence test replays three batches.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            # key keeps its SOURCE type (review finding — hardcoded
            # LongType + int(key[0]) crashed string keys and silently
            # truncated non-integer numeric ones)
            StructField(key_col, stream.schema[key_col].dataType),
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("s", LongType()),
            StructField("l", LongType()),
            StructField("n", LongType()),
        ]
    )
    gap_us = gap_sec * 1_000_000

    def fn(key, pdf_iter, state):
        cols = [f.name for f in out_schema.fields]
        if state.hasTimedOut:
            s, l, n = state.get
            state.remove()
            yield pd.DataFrame([[key[0], s, l + gap_us, n]], columns=cols)
            return
        s, l, n = state.get if state.exists else (None, None, 0)
        rows = []
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            for t in sorted(int(t) // 1000 for t in pdf[ts_col].astype("int64")):
                if s is None:
                    s, l, n = t, t, 1
                elif t - l <= gap_us:
                    # INCLUSIVE on purpose: Spark's session_window
                    # MERGES an event at exactly last + gap (verified
                    # empirically — the boundary test pins both
                    # engines; the batch docstring used to claim the
                    # strict rule, which was wrong)
                    l, n = max(l, t), n + 1
                else:
                    rows.append([key[0], s, l + gap_us, n])
                    s, l, n = t, t, 1
        state.update((s, l, n))
        # close when the watermark passes last + gap (epoch ms)
        state.setTimeoutTimestamp((l + gap_us) // 1000)
        yield (
            pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)
        )

    return (
        stream.withWatermark(ts_col, watermark)
        # Spark's late-row filter KEEPS null event times (the predicate
        # evaluates null → not late), so a NaT would reach the pandas
        # fold as INT64_MIN — opening a phantom pre-epoch session, and
        # a state whose l is INT64_MIN//1000 feeds
        # setTimeoutTimestamp a timestamp below the watermark, which
        # Spark rejects and the query dies (r12 review). A row with no
        # event time belongs to no session: drop it input-side.
        .filter(F.col(ts_col).isNotNull())
        .select(key_col, ts_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", "EventTimeTimeout"
        )
    )
