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
        p = event.progress
        self.metrics.append(
            BatchMetric(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                input_rows_per_second=p.inputRowsPerSecond or 0.0,
                process_rows_per_second=p.processedRowsPerSecond or 0.0,
                duration_ms=dict(p.durationMs or {}),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(m.num_input_rows for m in self.metrics)


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
