"""Count-based (ROW_BASED) windows in Structured Streaming.

The reference's row windows count tuples, not time
(``src/utils/WindowDefinition.h:13`` ROW_BASED measure; LRB2's stage-2
1024/1024 row window, ``LRB2.cpp:22-111``). Spark has no native
streaming count-window, so this is the one operator that needs a custom
stateful implementation: ``applyInPandasWithState`` keyed state holding
the open window's partial aggregates (SURVEY.md §7 hard part #1).

Scale model
-----------
Row windows are inherently *sequential in arrival order*. The reference
is single-node, so "arrival order" is global; on a cluster a global row
counter is a 1-partition bottleneck by definition. Two modes:

* ``keys=(...)`` (recommended): independent row windows **per key** —
  each key's rows are counted in its own arrival order; state and
  compute shard across executors by key. This is the scalable shape.
* ``keys=()``: global row windows — all rows flow through one state
  key. Correct, but single-task; only for reference-parity workloads
  (the reference itself is single-node, so this matches its envelope).

Within each micro-batch, rows are sorted by ``order_cols`` before
counting; across micro-batches, arrival order is batch order (the
reference assumes in-order input, ``README.md:16``).

Only COMPLETE windows are emitted (the open trailing window stays in
state — same as the reference, which emits a row window when the
tuple count reaches ``size``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from lightsaber_spark.operators.window_agg import AggSpec, _check_aggs


def _valid_chunk(chunk):
    """Null-skipping view of an agg-column chunk. Arrow hands a
    nullable long/double column to pandas as float64 + NaN; folding
    NaN into the running sum poisons the state forever, and counting
    the raw length counts nulls the batch twin's ``F.count(col)``
    skips (review finding). Integer dtypes carry no NaN and pass
    through untouched.

    Precision note (documented limit): min/max/sum state is float64,
    so integer inputs above 2^53 round — the batch twin is exact. The
    catalog's streamed values are far below that bound."""
    import numpy as np

    if chunk.dtype.kind == "f":
        return chunk[~np.isnan(chunk)]
    return chunk

_GLOBAL_KEY = "_global"


def _concat_sorted(pdf_iter, order_cols):
    """The group's Arrow chunks concatenated THEN sorted once — or
    None when the batch holds no rows for this key. Sorting each chunk
    independently (the old loop) processes rows in shuffle ARRIVAL
    order across chunk boundaries, so any key whose micro-batch
    exceeds one Arrow chunk (~10k rows default) counted rows into
    windows out of ``order_cols`` order — the funnel chunk-order bug
    (commit e925e67) found again here by the r12 review. Stable
    mergesort keeps arrival order among order_cols ties, matching the
    batch twin's tie behavior. One group's micro-batch rows are
    materialized — the same envelope the stateful fold already holds."""
    import pandas as pd

    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if not chunks:
        return None
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    return pdf.sort_values(order_cols, kind="mergesort")


def streaming_row_window_agg(
    stream: DataFrame,
    order_cols: Sequence[str],
    window_rows: int,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = (),
    slide_rows: int | None = None,
) -> DataFrame:
    """Streaming twin of ``operators.row_window_agg`` (complete windows
    only). Output: ``*keys``, ``window_id`` (0-based per key), one
    column per agg spec.

    ``slide_rows`` < ``window_rows`` gives SLIDING count windows
    (slide must divide size): state keeps a deque of size/slide pane
    partials — the row-based analog of the gcd-pane trick — so memory
    is O(size/slide) regardless of window size. Window j covers rows
    [j·slide, j·slide+size) and is emitted when its last pane fills.

    Supported aggs: sum/count/min/max/avg — the reference set
    (``AggregationType.h:12``). Partials kept in state are
    (sum, count, min, max) per agg column: all five compose from them
    across micro-batches.
    """
    if slide_rows is not None and slide_rows != window_rows:
        return _streaming_sliding_row_windows(
            stream, order_cols, window_rows, slide_rows, aggs, keys
        )
    import pandas as pd

    _check_aggs(aggs)
    keys = list(keys)
    order_cols = list(order_cols)

    in_fields = {f.name: f for f in stream.schema.fields}
    agg_cols = sorted({c for _f, c, _a in aggs if c is not None})

    key_fields = (
        [in_fields[k] for k in keys]
        if keys
        else [StructField(_GLOBAL_KEY, LongType())]
    )
    out_schema = StructType(
        key_fields
        + [StructField("window_id", LongType())]
        + [
            StructField(
                alias,
                LongType()
                if func == "count"
                else DoubleType()
                if func in ("avg", "sum")
                else in_fields[col].dataType,
            )
            for func, col, alias in aggs
        ]
    )
    # state: rows already in open window, open window id, then per agg
    # column: sum(double), count, min(double), max(double)
    state_fields = [StructField("n_open", LongType()), StructField("wid", LongType())]
    for c in agg_cols:
        state_fields += [
            StructField(f"sum_{c}", DoubleType()),
            StructField(f"cnt_{c}", LongType()),
            StructField(f"min_{c}", DoubleType()),
            StructField(f"max_{c}", DoubleType()),
        ]
    state_schema = StructType(state_fields)

    n_state_per_col = 4

    def fn(key, pdf_iter, state):
        if state.exists:
            st = list(state.get)
        else:
            st = [0, 0] + [0.0, 0, None, None] * len(agg_cols)

        def col_slot(ci):
            return 2 + ci * n_state_per_col

        out_rows = []

        def close_window():
            row = list(key) + [st[1]]
            for func, col, _alias in aggs:
                if col is None:
                    row.append(int(st[0]))
                    continue
                s = col_slot(agg_cols.index(col))
                if func == "sum":
                    row.append(st[s])
                elif func == "count":
                    row.append(int(st[s + 1]))
                elif func == "avg":
                    row.append(st[s] / st[s + 1] if st[s + 1] else None)
                elif func == "min":
                    row.append(st[s + 2])
                elif func == "max":
                    row.append(st[s + 3])
            out_rows.append(row)
            st[0] = 0
            st[1] += 1
            for ci in range(len(agg_cols)):
                s = col_slot(ci)
                st[s], st[s + 1], st[s + 2], st[s + 3] = 0.0, 0, None, None

        pdf = _concat_sorted(pdf_iter, order_cols)
        if pdf is not None:
            vals = {c: pdf[c].to_numpy() for c in agg_cols}
            n = len(pdf)
            i = 0
            while i < n:
                take = min(window_rows - st[0], n - i)
                for ci, c in enumerate(agg_cols):
                    chunk = _valid_chunk(vals[c][i : i + take])
                    s = col_slot(ci)
                    st[s] += float(chunk.sum())
                    st[s + 1] += int(len(chunk))
                    if len(chunk):
                        mn, mx = float(chunk.min()), float(chunk.max())
                        st[s + 2] = mn if st[s + 2] is None else min(st[s + 2], mn)
                        st[s + 3] = mx if st[s + 3] is None else max(st[s + 3], mx)
                st[0] += take
                i += take
                if st[0] == window_rows:
                    close_window()

        state.update(tuple(st))
        cols = [f.name for f in out_schema.fields]
        yield pd.DataFrame(out_rows, columns=cols)

    grouped = (
        stream.groupBy(*keys)
        if keys
        else stream.withColumn(_GLOBAL_KEY, F.lit(0).cast("long")).groupBy(_GLOBAL_KEY)
    )
    out = grouped.applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
    return out if keys else out.drop(_GLOBAL_KEY)


def _streaming_sliding_row_windows(
    stream: DataFrame,
    order_cols: Sequence[str],
    size: int,
    slide: int,
    aggs: Sequence[AggSpec],
    keys: Sequence[str],
) -> DataFrame:
    """Sliding count windows via a bounded deque of pane partials.

    State = JSON (compact, Arrow-friendly): current-pane fill count +
    up to size/slide completed pane partial tuples (sum, cnt, min, max
    per agg column). When a pane completes and the deque holds
    size/slide panes, the oldest-anchored window is emitted and the
    oldest pane dropped — O(size/slide) state per key, the row-based
    analog of ``WindowDefinition.h:80-90`` pane slicing.
    """
    import json

    import pandas as pd
    from pyspark.sql.types import StringType

    _check_aggs(aggs)
    if size % slide != 0:
        raise ValueError("slide must divide size for sliding row windows")
    k = size // slide
    keys = list(keys)
    order_cols = list(order_cols)

    in_fields = {f.name: f for f in stream.schema.fields}
    agg_cols = sorted({c for _f, c, _a in aggs if c is not None})

    key_fields = (
        [in_fields[kc] for kc in keys]
        if keys
        else [StructField(_GLOBAL_KEY, LongType())]
    )
    out_schema = StructType(
        key_fields
        + [StructField("window_id", LongType())]
        + [
            StructField(
                alias,
                LongType()
                if func == "count"
                else DoubleType()
                if func in ("avg", "sum")
                else in_fields[col].dataType,
            )
            for func, col, alias in aggs
        ]
    )
    state_schema = StructType([StructField("js", StringType())])

    def _new_pane():
        return {c: [0.0, 0, None, None] for c in agg_cols} | {"_n": 0}

    def fn(key, pdf_iter, state):
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"panes": [], "cur": _new_pane(), "done": 0}

        out_rows = []

        def close_pane():
            st["panes"].append(st["cur"])
            st["cur"] = _new_pane()
            st["done"] += 1
            if len(st["panes"]) == k:
                # window anchored at pane (done - k): emit aggregate
                wid = st["done"] - k
                row = list(key) + [wid]
                for func, col, _alias in aggs:
                    if col is None:
                        row.append(sum(p["_n"] for p in st["panes"]))
                        continue
                    ps = [p[col] for p in st["panes"]]
                    if func == "sum":
                        row.append(sum(p[0] for p in ps))
                    elif func == "count":
                        row.append(sum(p[1] for p in ps))
                    elif func == "avg":
                        cnt = sum(p[1] for p in ps)
                        row.append(sum(p[0] for p in ps) / cnt if cnt else None)
                    elif func == "min":
                        vals = [p[2] for p in ps if p[2] is not None]
                        row.append(min(vals) if vals else None)
                    elif func == "max":
                        vals = [p[3] for p in ps if p[3] is not None]
                        row.append(max(vals) if vals else None)
                out_rows.append(row)
                st["panes"].pop(0)

        pdf = _concat_sorted(pdf_iter, order_cols)
        if pdf is not None:
            vals = {c: pdf[c].to_numpy() for c in agg_cols}
            n = len(pdf)
            i = 0
            while i < n:
                take = min(slide - st["cur"]["_n"], n - i)
                for c in agg_cols:
                    chunk = _valid_chunk(vals[c][i : i + take])
                    p = st["cur"][c]
                    p[0] += float(chunk.sum())
                    p[1] += int(len(chunk))
                    if len(chunk):
                        mn, mx = float(chunk.min()), float(chunk.max())
                        p[2] = mn if p[2] is None else min(p[2], mn)
                        p[3] = mx if p[3] is None else max(p[3], mx)
                st["cur"]["_n"] += take
                i += take
                if st["cur"]["_n"] == slide:
                    close_pane()

        state.update((json.dumps(st),))
        cols = [f.name for f in out_schema.fields]
        yield pd.DataFrame(out_rows, columns=cols)

    grouped = (
        stream.groupBy(*keys)
        if keys
        else stream.withColumn(_GLOBAL_KEY, F.lit(0).cast("long")).groupBy(_GLOBAL_KEY)
    )
    out = grouped.applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
    return out if keys else out.drop(_GLOBAL_KEY)
