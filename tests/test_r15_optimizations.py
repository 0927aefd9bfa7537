"""Round-15 optimization equivalence pins.

Every optimization that changed an operator's internals gets a focused
bit-equality test against the unoptimized composition it replaced:

- fused single-Python-pass media pipelines (synthetic_png_decoded /
  synthetic_png_ahash / synthetic_wav_decoded /
  synthetic_wav_fingerprint / synthetic_video_frames) vs the original
  two-stage encode→transfer→decode chains;
- ``banded_hamming_pairs(carry_cols=...)`` vs re-joining the carried
  payload onto the pair table per side;
- ``gap_filled`` / ``interpolated_fill`` union+merge spine attach vs
  the left-join composition it replaced (plus the no-join-node plan
  contract that IS the optimization).

The k-means sv persist, the prefix-path union-dense rewrite, and the
semantic-delta pre-assigned kept path are covered by the existing
oracle/property suites (test_window_properties prefix-vs-pane,
test_sketches delta composition, scripts/check_parity) — they change
plan shape, not values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 120).select(F.col("id").alias("doc_id"))


def test_fused_png_decode_equivalence(spark, ids_df):
    from lightsaber_spark.functions.multimodal import (
        decode_media,
        synthetic_png_decoded,
        synthetic_png_media,
    )

    fused = synthetic_png_decoded(ids_df)
    staged = decode_media(synthetic_png_media(ids_df), real_codec=True)
    assert _rows(fused) == _rows(staged)


def test_fused_png_ahash_equivalence(spark, ids_df):
    from lightsaber_spark.functions.image_dedup import (
        ahash_media,
        synthetic_png_ahash,
    )
    from lightsaber_spark.functions.multimodal import synthetic_png_media

    fused = synthetic_png_ahash(ids_df)
    staged = ahash_media(synthetic_png_media(ids_df))
    assert _rows(fused) == _rows(staged)


def test_fused_wav_decode_equivalence(spark, ids_df):
    from lightsaber_spark.functions.multimodal import (
        decode_audio,
        synthetic_wav_decoded,
        synthetic_wav_media,
    )

    fused = synthetic_wav_decoded(ids_df)
    staged = decode_audio(synthetic_wav_media(ids_df))
    assert _rows(fused) == _rows(staged)


def test_fused_wav_fingerprint_equivalence(spark, ids_df):
    from lightsaber_spark.functions.audio_dedup import (
        fingerprint_media,
        synthetic_wav_fingerprint,
    )
    from lightsaber_spark.functions.multimodal import synthetic_wav_media

    fused = synthetic_wav_fingerprint(ids_df, frame=16, n_bits=32)
    staged = fingerprint_media(synthetic_wav_media(ids_df), frame=16, n_bits=32)
    assert _rows(fused) == _rows(staged)


def test_fused_video_frames_equivalence(spark, ids_df):
    from lightsaber_spark.functions.multimodal import (
        sample_frames_real,
        synthetic_video_frames,
        synthetic_video_media,
    )

    fused = synthetic_video_frames(ids_df, every_n=2)
    staged = sample_frames_real(synthetic_video_media(ids_df), every_n=2)
    assert _rows(fused) == _rows(staged)


def test_banded_hamming_carry_cols(spark):
    """carry_cols rides payload columns through the banded join with
    values identical to re-joining them per side, and does not perturb
    the pair set."""
    from lightsaber_spark.functions.hamming import banded_hamming_pairs

    rows = [
        (1, 0b0000, 10),
        (2, 0b0001, 20),  # hamming(1,2)=1
        (3, 0b0011, 30),  # hamming(2,3)=1, hamming(1,3)=2
        (4, 0b1111_1111, 40),
    ]
    sig = spark.createDataFrame(rows, "id BIGINT, h BIGINT, cnt BIGINT")
    plain = banded_hamming_pairs(sig, "id", "h", n_bits=8, n_bands=4, max_hamming=2)
    carried = banded_hamming_pairs(
        sig, "id", "h", n_bits=8, n_bands=4, max_hamming=2, carry_cols=("cnt",)
    )
    by_cnt = {int(r.id): int(r.cnt) for r in sig.collect()}
    plain_rows = _rows(plain.select("id_a", "id_b", "hamming"))
    carried_rows = carried.select("id_a", "id_b", "cnt_a", "cnt_b", "hamming").collect()
    assert sorted((r.id_a, r.id_b, r.hamming) for r in carried_rows) == plain_rows
    for r in carried_rows:
        assert r.cnt_a == by_cnt[r.id_a]
        assert r.cnt_b == by_cnt[r.id_b]


@pytest.fixture(scope="module")
def gap_events(spark):
    # sparse event times (gaps of several windows), two keys, one
    # all-NULL-value window per key would be overkill here — the NULL
    # sum semantics are pinned by test_window_agg/test_streaming
    rows = [
        (100, "a", 5),
        (130, "a", 7),
        (400, "a", 11),
        (100, "b", 1),
        (700, "b", 3),
    ]
    return spark.createDataFrame(rows, "t BIGINT, k STRING, v BIGINT").select(
        F.timestamp_seconds("t").alias("ts"), "k", "v"
    )


def test_gap_filled_union_matches_left_join(spark, gap_events):
    """gap_filled's union+merge attach is row-identical to the left
    join it replaced (guide §2.4: the join broadcast a span-bound side
    — see operators/window_agg.py), keyed and un-keyed."""
    from lightsaber_spark.operators import windowed_agg, window_spine
    from lightsaber_spark.operators.window_agg import gap_filled

    aggs = [("count", None, "n"), ("sum", "v", "s")]
    # un-keyed
    agg = windowed_agg(gap_events, "ts", 60, 60, aggs)
    spine = window_spine(gap_events, "ts", 60, 60)
    got = gap_filled(agg, spine, aggs)
    ref = spine.join(agg, on=["window_start"], how="left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    assert _rows(got) == _rows(ref)
    # keyed
    kagg = windowed_agg(gap_events, "ts", 60, 60, aggs, ["k"])
    keys = gap_events.select("k").distinct()
    kgot = gap_filled(kagg, spine, aggs, keys_df=keys)
    kref = (
        spine.crossJoin(keys)
        .join(kagg, on=["window_start", "k"], how="left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    assert _rows(kgot.select("window_start", "k", "n", "s")) == _rows(
        kref.select("window_start", "k", "n", "s")
    )


def test_gap_filled_plan_has_no_join(spark, gap_events):
    """The point of the union shape: NO join node anywhere in the
    un-keyed gap-fill plan (the old shape broadcast a span-bound
    relation — a driver collect that grows with the time span)."""
    from lightsaber_spark.operators import windowed_agg, window_spine
    from lightsaber_spark.operators.window_agg import gap_filled
    from lightsaber_spark.plan_audit import formatted_plan

    aggs = [("count", None, "n")]
    agg = windowed_agg(gap_events, "ts", 60, 60, aggs)
    spine = window_spine(gap_events, "ts", 60, 60)
    plan = formatted_plan(gap_filled(agg, spine, aggs), adaptive=False)
    assert "Join" not in plan, plan


def test_interpolated_fill_union_matches_left_join(spark, gap_events):
    """interpolated_fill's union+merge grid attach is value-identical
    to the left-join composition (the downstream window scans see
    row-identical input)."""
    from lightsaber_spark.operators.window_agg import interpolated_fill

    agg = (
        gap_events.select(
            "k",
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 60).alias("t"),
            "v",
        )
        .groupBy("k", "t")
        .agg(F.sum("v").alias("s"))
    )
    rng = agg.groupBy("k").agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    grid = rng.select(
        "k", F.explode(F.expr("sequence(lo, hi, CAST(60 AS BIGINT))")).alias("t")
    )
    got = interpolated_fill(agg, grid, "s", keys=["k"], t_col="t")
    # reference: the pre-r15 left-join composition, inlined
    from pyspark.sql.window import Window as W

    g = grid.join(agg, on=["k", "t"], how="left")
    part = W.partitionBy("k")
    w_prev = part.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    w_next = part.orderBy("t").rowsBetween(0, W.unboundedFollowing)
    v, t = F.col("s"), F.col("t")
    present_t = F.when(v.isNotNull(), t)
    num = F.when(v.isNotNull(), v).otherwise(
        F.last(v, ignorenulls=True).over(w_prev)
        * (F.first(present_t, ignorenulls=True).over(w_next) - t)
        + F.first(v, ignorenulls=True).over(w_next)
        * (t - F.last(present_t, ignorenulls=True).over(w_prev))
    )
    den = F.when(v.isNotNull(), F.lit(1)).otherwise(
        F.first(present_t, ignorenulls=True).over(w_next)
        - F.last(present_t, ignorenulls=True).over(w_prev)
    )
    ref = (
        g.withColumn("num", num.cast("bigint"))
        .withColumn("den", den.cast("bigint"))
        .filter(F.col("num").isNotNull())
        .select("k", "t", "num", "den")
    )
    assert _rows(got) == _rows(ref)
