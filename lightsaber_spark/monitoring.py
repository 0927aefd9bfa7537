"""Throughput / latency monitoring.

Reference: ``src/monitors/PerformanceMonitor.cpp:31-56`` prints input/
output MB/s + tuples/s every interval; ``src/monitors/LatencyMonitor.h:
17-24`` tracks avg/min/max end-to-end latency via a latency mark
multiplexed into the first tuple of each batch
(``TaskDispatcher.cpp:342-352``).

Spark-side the same signals come from the engine, not hand-rolled
timers: ``StreamingQueryListener`` receives per-microbatch progress
(rows/sec, batch durations, state-store metrics), and the
``DataFrame.observe``/``Observation`` API collects exact custom metrics
(row counts, sums) from a batch run without a second scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float
    duration_ms: dict
    # per-batch state-operator metrics (numRowsTotal, update/removal/
    # commit times, ...) — captured per batch so consumers can attribute
    # state cost from the SAME batches their throughput figure uses,
    # not from whatever lastProgress holds when they sample it
    state_operators: list = field(default_factory=list)


@dataclass
class ThroughputListener(StreamingQueryListener):
    """Collects per-microbatch throughput, the analog of the
    reference's ``[MON]`` lines (``Measurement.cpp:42-54``). Attach
    with ``spark.streams.addListener(listener)``; read ``metrics``
    after the run (or live)."""

    metrics: list[BatchMetric] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        import json as _json

        p = event.progress
        try:
            state_ops = _json.loads(p.json).get("stateOperators", [])
        except Exception:
            state_ops = []
        self.metrics.append(
            BatchMetric(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                input_rows_per_second=p.inputRowsPerSecond or 0.0,
                process_rows_per_second=p.processedRowsPerSecond or 0.0,
                duration_ms=dict(p.durationMs or {}),
                state_operators=state_ops,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(m.num_input_rows for m in self.metrics)

    def mon_lines(self, bytes_per_tuple: int | None = None) -> list[str]:
        """Per-batch report lines in the shape of the reference's
        ``[MON]`` output (``Measurement.cpp:42-54`` prints MB/s and
        tuples/s per interval; here the interval is the micro-batch).
        ``bytes_per_tuple`` (e.g. the input schema width) enables the
        MB/s column; without it only tuples/s is reported."""
        out = []
        for m in self.metrics:
            tps = m.process_rows_per_second or 0.0
            if bytes_per_tuple:
                mbs = tps * bytes_per_tuple / 1e6
                out.append(
                    f"[MON] batch {m.batch_id}: {mbs:.2f} MB/s ({tps:.0f} t/sec)"
                )
            else:
                out.append(f"[MON] batch {m.batch_id}: {tps:.0f} t/sec")
        return out


@dataclass
class LatencyStats:
    """Running end-to-end latency aggregate — the analog of the
    reference's ``LatencyMonitor.h:17-24`` (m_avg/m_min/m_max over
    latency marks)."""

    n_batches: int = 0
    avg_ms: float = 0.0
    min_ms: float = float("inf")
    max_ms: float = 0.0

    def update(self, latency_ms: float) -> None:
        self.n_batches += 1
        self.avg_ms += (latency_ms - self.avg_ms) / self.n_batches
        self.min_ms = min(self.min_ms, latency_ms)
        self.max_ms = max(self.max_ms, latency_ms)


LATENCY_MARK = "latency_mark"


def with_latency_mark(df: DataFrame, mark_col: str = "_mark_us") -> DataFrame:
    """Multiplex a latency mark into the stream — the analog of the
    reference stamping a dispatch timestamp into the first tuple of
    each batch (``TaskDispatcher.cpp:342-352``). ``current_timestamp``
    is the micro-batch's fixed batch timestamp, so the mark is 'when
    this batch entered the engine'; sink-side observation closes the
    end-to-end interval."""
    return df.withColumn(mark_col, F.unix_micros(F.current_timestamp()))


def observe_latency(df: DataFrame, mark_col: str = "_mark_us") -> DataFrame:
    """Attach the sink-side latency observation (min mark + row count)
    computed inline with each micro-batch — no second scan. Pair with
    :class:`LatencyListener` to turn observed marks into avg/min/max
    end-to-end latency."""
    return df.observe(
        LATENCY_MARK,
        F.min(F.col(mark_col)).alias("mark_us"),
        F.count(F.lit(1)).alias("rows"),
    )


class LatencyListener(StreamingQueryListener):
    """Turns per-batch observed latency marks into running avg/min/max
    latency (``LatencyMonitor.h:17-24`` analog): when a progress event
    carries the ``latency_mark`` observation, latency = progress-event
    wall clock − batch mark. Attach with
    ``spark.streams.addListener(listener)``; read ``stats`` after (or
    during) the run."""

    def __init__(self) -> None:
        self.stats = LatencyStats()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        import time

        om = event.progress.observedMetrics or {}
        row = om.get(LATENCY_MARK)
        if row is None or row["mark_us"] is None or row["rows"] == 0:
            return
        now_us = time.time_ns() // 1_000
        self.stats.update((now_us - row["mark_us"]) / 1000.0)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def observed(df: DataFrame, name: str = "metrics"):
    """Attach exact row/byte counters to a batch plan; returns
    ``(df, observation)``. After any action on ``df``, read
    ``observation.get`` — a free-of-charge aggregation computed inline
    with the job (no second scan), the batch analog of the reference's
    output-throughput counters."""
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    return out, obs
