"""Streaming sketch operators: bounded-state approximate aggregates
over event-time windows.

The batch sketches (functions/sketches.py KMV/CMS/Bloom,
functions/hll.py) are all built from mergeable per-group state, which
is exactly what a streaming stateful aggregation maintains — so the
streaming twins are the same map-side expressions feeding a native
windowed max/min aggregation, and the state store holds ≤ m (or k)
rows per open window regardless of stream volume. That bounded-state
property is the reference's rationale for windowed sketches
(SURVEY §2.4's bounded aggregation state) carried to Spark's state
store.

Equivalence with the batch path is pinned in
tests/test_streaming_sketches.py: registers accumulated across
micro-batches max-merge to exactly the batch registers (HLL registers
are idempotent-max state, so replay/exactly-once recovery cannot
corrupt them), and the folded estimate is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lightsaber_spark.functions.hll import hll_bucket_rho


def streaming_hll_window_registers(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    size_sec: int,
    m: int = 256,
    watermark: str = "0 seconds",
) -> DataFrame:
    """HLL registers per tumbling event-time window over a stream:
    (window_start: long epoch-sec, bucket, rho = max trailing-zero
    rank). Native ``F.window`` keys the state store so watermark GC can
    expire closed windows; the aggregate is a plain ``max``, so state
    is ≤ m rows per open window.

    ``window_start`` is emitted as epoch seconds, aligning with the
    batch path's integer-µs bucketing (``operators/window_agg.py
    epoch_us``) — the equivalence test pins that the two bucketings
    agree row-for-row.

    Fold the output with ``functions.hll.hll_estimate`` (grouping on
    ``window_start``) to get the distinct estimate; chaining the fold
    as a second streaming aggregation is possible in append mode but
    the register table is the more useful sink (mergeable across
    restarts and late replays).
    """
    s = stream.withWatermark(ts_col, watermark)
    w = s.select(
        F.window(F.col(ts_col), f"{size_sec} seconds").alias("window"),
        F.col(value_col),
    )
    pre = hll_bucket_rho(w, ["window"], value_col, m)
    return (
        pre.groupBy("window", "bucket")
        .agg(F.max("rho").alias("rho"))
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            "bucket",
            "rho",
        )
    )
