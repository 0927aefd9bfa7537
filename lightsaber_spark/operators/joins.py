"""Join operators.

Reference coverage (SURVEY.md §2.7):
* ``StaticHashJoin`` — stream × static equi join, build-once hash table
  (``src/cql/operators/StaticHashJoin.h:14-79``; used by YSB,
  ``test/.../YahooBenchmark/YSB.cpp:168-175``) → Spark broadcast join.
* ``ThetaJoin`` — symmetric windowed nested-loop join with an arbitrary
  comparison predicate (``src/cql/operators/ThetaJoin.h:18-819``) →
  time-bounded join; Spark picks nested-loop/broadcast only where it
  must, and a range condition on event time keeps the pair space
  bounded at scale.

Beyond parity we add as-of joins (nearest-earlier match), a staple the
reference lacks but a training-data pipeline needs.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd  # noqa: F401 — must be module-global for pandas-UDF
# type-hint resolution under `from __future__ import annotations`
from pyspark.sql import Column, DataFrame, Window, functions as F


def static_hash_join(
    stream: DataFrame,
    static: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Stream×static equi join with an explicitly broadcast build side.

    The reference builds the static hash table once at query setup
    (``StaticHashJoin.h:30-46``); ``broadcast()`` is the cluster
    equivalent — ships the dim to every executor, no shuffle of the
    100 TB probe side.
    """
    return stream.join(F.broadcast(static), on, how)


def theta_join(
    left: DataFrame,
    right: DataFrame,
    predicate: Column,
    left_ts: str | None = None,
    right_ts: str | None = None,
    max_delta_sec: float | None = None,
) -> DataFrame:
    """Windowed theta join (arbitrary comparison predicate).

    Reference semantics (``ThetaJoin.h:198-415``): each side keeps a
    window of recent tuples; every (l, r) pair inside the combined
    window is tested against the predicate; output concatenates both
    tuples.

    At scale an unbounded theta join is a cross product, so callers
    supply the event-time bound (``max_delta_sec``) the reference gets
    implicitly from its window definitions. A naive band condition still
    plans as a nested-loop join (non-equi), so the band is rewritten as
    a **bucketed equi join**: time is bucketed at ``max_delta`` width,
    the right side is exploded to its bucket ±1 (any pair within the
    band differs by at most one bucket), the join key is the bucket —
    a plain shuffle hash join with the exact band + theta predicate
    applied after. Pair space per task is bounded by bucket occupancy,
    not |L|·|R|. Columns must be disambiguated by the caller (aliases).
    """
    cond = predicate
    if max_delta_sec is None:
        return left.join(right, cond, "inner")
    if left_ts is None or right_ts is None:
        raise ValueError("time-bounded theta join needs both ts columns")

    us = 1_000_000
    d_us = int(round(max_delta_sec * us))
    if d_us < 1:
        # DIV 0 yields NULL buckets on BOTH sides and NULL never
        # equi-joins — a zero/sub-µs band would silently return an
        # empty result (r12 review). Exact-timestamp pairing is an
        # equi-join on the timestamp, not a band join.
        raise ValueError(
            "max_delta_sec must be >= 1 µs; for exact-timestamp pairing "
            "equi-join on the timestamp column instead"
        )
    from lightsaber_spark.operators.window_agg import epoch_us

    # exact integer µs via epoch_us + SQL DIV (CLAUDE.md exactness
    # invariant — the former cast('double')·1e6 was float epoch math
    # and threw on TIMESTAMP_NTZ columns; the streaming twin was
    # converted in the same round)
    lt_us = epoch_us(left, left_ts)
    rt_us = epoch_us(right, right_ts)
    band = (rt_us >= lt_us - d_us) & (rt_us <= lt_us + d_us)
    cond = band if cond is None else (band & cond)

    l2 = left.withColumn("_tj_us", lt_us).withColumn(
        "_tj_bkt", F.expr(f"_tj_us DIV {d_us}")
    ).drop("_tj_us")
    rb = F.expr(f"_tj_us DIV {d_us}")
    r2 = (
        right.withColumn("_tj_us", rt_us)
        .withColumn("_tj_bkt", F.explode(F.array(rb - 1, rb, rb + 1)))
        .drop("_tj_us")
    )
    return l2.join(r2, "_tj_bkt").filter(cond).drop("_tj_bkt")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi join: hot keys on the (large, skewed) left
    side no longer land in one reducer.

    Left rows get a deterministic salt in ``[0, n_salts)`` (xxhash64 of
    the full row — stable under task retry); the (smaller) right side is
    replicated ``n_salts``× via ``explode``; the join key becomes
    ``(key, salt)``, so each hot key fans out over ``n_salts`` reducers.
    Result is exactly the plain equi join — salting only changes the
    partitioning. AQE's skew-join handles *sort-merge* skew splits
    automatically; explicit salting is the declarative fallback that
    also works for hash joins, bucketed layouts, and streaming
    micro-batches where AQE cannot re-plan.

    ``how`` supports inner/left joins (right replication makes
    right-outer semantics ambiguous per salt).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner|left")
    keys = [on] if isinstance(on, str) else list(on)
    l2 = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    r2 = right.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(n_salts - 1).cast("bigint"))
        ),
    )
    return l2.join(r2, keys + ["_salt"], how).drop("_salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    extra: Column | None = None,
) -> DataFrame:
    """Interval join: left rows matched to right rows whose
    [lo, hi) interval contains the left timestamp. Bounds compare in
    exact integer microseconds (handles TIMESTAMP_NTZ, which cannot
    cast to double). Pass the equality key (if any) via ``extra`` —
    Catalyst extracts equi conjuncts as hash-join keys, leaving the
    interval as a residual filter."""
    from lightsaber_spark.operators.window_agg import epoch_us

    lt = epoch_us(left, left_ts)
    lo, hi = epoch_us(right, right_lo), epoch_us(right, right_hi)
    cond = (lt >= lo) & (lt < hi)
    if extra is not None:
        cond = cond & extra
    return left.join(right, cond, "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_ts_left: str,
    on_ts_right: str,
    by: Sequence[str] = (),
    tolerance_sec: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single nearest right row at or
    before (``backward``) / at or after (``forward``) its timestamp,
    optionally within ``tolerance_sec``, matching on the ``by`` keys.

    Implemented as a union + window scan (one shuffle on the ``by``
    keys, linear state) rather than a pair join — the scalable plan: a
    band join would re-test every candidate pair, this carries the last
    seen right row forward with ``last(ignorenulls)`` over a key-
    partitioned ordering.

    Right columns (except ``by``/ts) are returned with their names;
    a right column whose name collides with a left column raises
    (alias before joining) — the scan cannot carry both.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    by = list(by)
    lcols = left.columns
    rcols = [c for c in right.columns if c not in by]
    dup = sorted(set(rcols) & set(lcols))
    if dup:
        # the union-scan would null the carried right values for these
        # and emit duplicate output names — silent data loss (review
        # finding); force the caller to alias instead
        raise ValueError(
            f"asof_join: right columns {dup} collide with left columns "
            "— alias one side before joining"
        )
    internal = {"_t", "_side", "_c_t"} | {f"_r_{c}" for c in rcols} | {
        f"_c_{c}" for c in rcols
    }
    clash = sorted(internal & set(lcols))
    if clash:
        # withColumn would silently OVERWRITE a left column named like
        # one of the scan's internals and emit epoch-µs garbage under
        # the user's name (r12 review) — raise like the rcols∩lcols case
        raise ValueError(
            f"asof_join: left columns {clash} collide with the "
            "union-scan's internal names — alias them before joining"
        )

    from lightsaber_spark.operators.window_agg import epoch_us

    lt = left.withColumn("_t", epoch_us(left, on_ts_left)).withColumn("_side", F.lit(1))
    rt = right.withColumn("_t", epoch_us(right, on_ts_right)).withColumn("_side", F.lit(0))
    for c in rcols:
        lt = lt.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    for c in lcols:
        if c not in by:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rt = rt.select(
        *[F.col(c) for c in lcols], "_t", "_side",
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    lt = lt.select(*[F.col(c) for c in lcols], "_t", "_side", *[F.col(f"_r_{c}") for c in rcols])
    unioned = lt.unionByName(rt)

    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(F.col("_t").asc(), F.col("_side").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
    else:
        # _side ASC here too: at equal _t the right row must scan BEFORE
        # the left row so an exactly-at-timestamp match is carried —
        # `>=` semantics, matching DuckDB ASOF (caught by
        # tests/test_asof.py::test_asof_forward_includes_equality).
        w = Window.partitionBy(*by).orderBy(F.col("_t").desc(), F.col("_side").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
    carried = unioned
    for c in rcols:
        carried = carried.withColumn(f"_c_{c}", F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w))
    carried = carried.withColumn("_c_t", F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w))

    out = carried.filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        # _t is integer microseconds (epoch_us)
        within = F.abs(F.col("_t") - F.col("_c_t")) <= int(tolerance_sec * 1_000_000)
        for c in rcols:
            out = out.withColumn(f"_c_{c}", F.when(within, F.col(f"_c_{c}")))
    sel = [F.col(c) for c in lcols] + [F.col(f"_c_{c}").alias(c) for c in rcols]
    return out.select(*sel)


def asof_broadcast_join(
    left: DataFrame,
    right: DataFrame,
    on_ts_left: str,
    on_ts_right: str,
    by: Sequence[str],
    direction: str = "backward",
    tolerance_sec: float | None = None,
    out_col: str = "asof_ts_us",
) -> DataFrame:
    """As-of against a SMALL right side: the right rows fold to one
    sorted timestamp array per key (a few thousand keys × history), the
    key table broadcasts, and each left row binary-searches its match —
    an Arrow-batched ``searchsorted`` per batch, no shuffle of the left
    side at all.

    This is (a) the broadcast-dimension batch plan when the right side
    fits the driver/broadcast budget (the union+window :func:`asof_join`
    is the big-big path), and (b) the STREAMING as-of enrichment plan:
    every op here is stateless, so it runs under any output mode with
    watermarks passing through untouched — no custom state needed.

    Emits ``left.* + out_col`` (epoch µs of the matched right row, null
    when nothing qualifies).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward|forward|nearest")
    import numpy as np
    import pandas as pd

    from lightsaber_spark.operators.window_agg import epoch_us

    by = list(by)
    r = (
        right.withColumn("_rt", epoch_us(right, on_ts_right))
        .groupBy(*by)
        .agg(F.sort_array(F.collect_list("_rt")).alias("_rts"))
    )
    j = left.withColumn("_lt", epoch_us(left, on_ts_left)).join(
        F.broadcast(r), by, "left"
    )
    # scale THEN truncate — int(tolerance_sec)*1e6 floored a float
    # tolerance to whole seconds (0.5 s silently became 0), diverging
    # from asof_join's sub-second handling (r12 review)
    tol_us = None if tolerance_sec is None else int(tolerance_sec * 1_000_000)

    @F.pandas_udf("bigint")
    def _lookup(ts: pd.Series, arrs: pd.Series) -> pd.Series:
        out = []
        for t, arr in zip(ts, arrs):
            if arr is None or len(arr) == 0 or pd.isna(t):
                out.append(None)
                continue
            a = np.asarray(arr, dtype=np.int64)
            t = int(t)
            i = int(np.searchsorted(a, t, side="right"))
            prev = int(a[i - 1]) if i >= 1 else None
            # side="right" means an exact-equality match lands in prev;
            # nxt is the first strictly-later timestamp
            nxt = int(a[i]) if i < len(a) else None
            if direction == "backward":
                m = prev
            elif direction == "forward":
                # at-or-after: equality belongs to the match
                m = t if prev == t else nxt
            else:  # nearest — ties to backward
                if prev is None:
                    m = nxt
                elif nxt is None:
                    m = prev
                else:
                    m = prev if t - prev <= nxt - t else nxt
            if m is not None and tol_us is not None and abs(m - t) > tol_us:
                m = None
            out.append(m)
        return pd.Series(out, dtype="object")

    return j.withColumn(out_col, _lookup(F.col("_lt"), F.col("_rts"))).drop(
        "_lt", "_rts"
    )
