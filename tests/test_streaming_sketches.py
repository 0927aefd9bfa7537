"""Streaming HLL (streaming/sketches.py): micro-batch register
accumulation must reproduce the batch registers exactly, across both
bucketing paths (native F.window vs integer-µs epoch bucketing)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream_src(spark, tmp_path_factory):
    from lightsaber_spark.session import load_tables

    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    path = str(tmp_path_factory.mktemp("events_hll_stream"))
    # several files so availableNow replays as multiple micro-batches
    ev.sort("ts").repartition(4).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    return path, schema


def test_streaming_hll_registers_match_batch(
    spark, events, events_stream_src, tmp_path
):
    from lightsaber_spark.functions.hll import hll_estimate, hll_registers
    from lightsaber_spark.operators.window_agg import _exact_bucket, epoch_us
    from lightsaber_spark.streaming.sketches import (
        streaming_hll_window_registers,
    )
    from lightsaber_spark.streaming.stream import (
        read_stream,
        run_available_now,
    )

    path, schema = events_stream_src
    stream = read_stream(spark, path, schema, max_files_per_trigger=1)
    s = streaming_hll_window_registers(
        stream, "ts", "user_id", size_sec=21600, m=64
    )
    # complete mode: every window's registers, incl. the last open one
    got = run_available_now(
        s, str(tmp_path / "ck"), "complete", table_name="t_hll_regs"
    )

    ev = events.withColumn(
        "window_start", _exact_bucket(epoch_us(events, "ts"), 21600)
    )
    want = hll_registers(ev, ["window_start"], "user_id", m=64)

    a = sorted(map(tuple, got.select("window_start", "bucket", "rho").collect()))
    b = sorted(map(tuple, want.collect()))
    assert a and a == b

    # and the fold over the streamed registers gives the batch estimate
    est_stream = sorted(
        map(
            tuple,
            hll_estimate(
                got.select("window_start", "bucket", "rho"),
                ["window_start"],
                m=64,
            ).collect(),
        )
    )
    est_batch = sorted(
        map(tuple, hll_estimate(want, ["window_start"], m=64).collect())
    )
    assert est_stream == est_batch


def test_streaming_ohlc_matches_batch(spark, events, events_stream_src, tmp_path):
    """Streaming struct-min/max OHLC == the staged batch row_number
    formulation, across both bucketing paths (F.window vs integer-µs)."""
    from lightsaber_spark.staged_queries import ohlc_bars_by_type
    from lightsaber_spark.streaming.ohlc import streaming_ohlc
    from lightsaber_spark.streaming.stream import (
        read_stream,
        run_available_now,
    )
    from tests.conftest import SF_DIR

    path, schema = events_stream_src
    stream = read_stream(spark, path, schema, max_files_per_trigger=1)
    s = streaming_ohlc(
        stream, "ts", "value", size_sec=21600, keys=("event_type",)
    )
    got = run_available_now(
        s, str(tmp_path / "ck_ohlc"), "complete", table_name="t_ohlc"
    )
    want = ohlc_bars_by_type(spark, SF_DIR)
    cols = ["window_start", "event_type", "n", "open_value",
            "close_value", "high_value", "low_value"]
    a = sorted(map(tuple, got.select(*cols).collect()))
    b = sorted(map(tuple, want.select(*cols).collect()))
    assert a and a == b
