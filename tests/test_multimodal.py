"""Multimodal plumbing: the real stdlib PNG codec (all five scanline
filter types, CRC verification) and its Spark mapInPandas end-to-end.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lightsaber_spark.functions.multimodal import (
    decode_media,
    decode_png,
    encode_png,
    synthetic_png_media,
)


def test_png_roundtrip_all_filter_types():
    rng = random.Random(7)
    for _ in range(8):
        w, h = rng.randint(1, 70), rng.randint(1, 50)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        for ftype in range(5):
            blob = encode_png(px, w, h, filter_for_row=lambda y, f=ftype: f)
            assert decode_png(blob) == (w, h, px), f"filter {ftype}"
        mixed = encode_png(px, w, h, filter_for_row=lambda y: (y * 3 + 1) % 5)
        assert decode_png(mixed) == (w, h, px)


def test_png_rejects_corruption():
    blob = bytearray(encode_png(bytes(range(16)), 4, 4))
    blob[20] ^= 0xFF  # flip a byte inside IHDR payload → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + bytes(blob))
    # truncated mid-chunk (e.g. a partial upload) must raise the
    # codec's ValueError family, not an opaque struct.error
    whole = encode_png(bytes(range(16)), 4, 4)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(whole[: len(whole) * 3 // 4])  # cut inside IDAT


def test_decode_media_real_codec_spark(spark):
    """End-to-end through mapInPandas: synthesize real PNGs from ids,
    decode, and check dimensions + exact pixel sums."""
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = decode_media(synthetic_png_media(ids), real_codec=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 40
    for i in range(40):
        w, h = i % 61 + 4, i % 37 + 3
        expect = sum((i + x + y) % 251 for x in range(w) for y in range(h))
        r = rows[i]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["pixel_sum"] == expect


def test_decode_media_real_rejects_non_png(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not a png"), "text/plain")],
        "media_id long, data binary, mime string",
    )
    with pytest.raises(Exception, match="signature"):
        decode_media(df, real_codec=True).collect()


def test_wav_roundtrip_and_rejection():
    import pytest
    import struct

    from lightsaber_spark.functions.multimodal import decode_wav, encode_wav

    samples = [((11 + 1) * (i + 7)) % 4001 - 2000 for i in range(77)]
    blob = encode_wav(samples, 24000)
    rate, n, out = decode_wav(blob)
    assert (rate, n, out) == (24000, 77, samples)
    # extremes survive sign-extension
    assert decode_wav(encode_wav([-32768, 32767, 0], 8000))[2] == [-32768, 32767, 0]
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"JUNK" + blob[4:])
    with pytest.raises(ValueError, match="RIFF size"):
        decode_wav(blob[:-2])
    # flip fmt to stereo -> unsupported
    bad = bytearray(blob)
    ch_off = blob.index(b"fmt ") + 8 + 2
    struct.pack_into("<H", bad, ch_off, 2)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_decode_audio_spark(spark, tables):
    from lightsaber_spark.functions.multimodal import decode_audio, synthetic_wav_media

    out = decode_audio(synthetic_wav_media(tables["documents"].limit(20))).collect()
    assert len(out) == 20
    for r in out:
        assert r["n_samples"] == r["media_id"] % 200 + 50
        assert r["sample_rate"] == 8000 * (r["media_id"] % 3 + 1)
        assert 0 <= r["amp_sum"] <= 2000 * r["n_samples"]


def test_video_container_roundtrip_and_corruption():
    """encode_video/decode_video round-trip exactly; a flipped byte in
    a frame's PNG payload fails the PNG CRC, and container-level
    corruption (bad magic, truncation, trailing bytes) raises at the
    demux layer."""
    import pytest

    from lightsaber_spark.functions.multimodal import (
        decode_png,
        decode_video,
        encode_png,
        encode_video,
    )

    frames = [
        encode_png(bytes((x + y + f) % 251 for y in range(3) for x in range(5)), 5, 3)
        for f in range(3)
    ]
    blob = encode_video(frames)
    assert decode_video(blob) == frames
    for f in decode_video(blob):
        w, h, px = decode_png(f)
        assert (w, h) == (5, 3) and len(px) == 15

    with pytest.raises(ValueError, match="magic"):
        decode_video(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_video(blob[:-3])
    with pytest.raises(ValueError, match="trailing"):
        decode_video(blob + b"\x00")
    # corrupt one byte inside frame 0's IDAT: PNG layer must object
    bad = bytearray(blob)
    bad[60] ^= 0xFF
    corrupted = decode_video(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(corrupted[0])


def test_spread_gate_marker_named_columns_still_spread(spark):
    """Round-7 verdict hardening: the laziness gate parses node NAMES
    at plan-tree line starts, so a column whose name contains a marker
    word ('window_start', 'SortKey') must NOT disable the spread."""
    from lightsaber_spark.functions.multimodal import (
        _plan_is_shuffle_free,
        _spread_ids,
    )

    df = spark.range(10).select(
        F.col("id").alias("window_start"), (F.col("id") % 3).alias("SortKey")
    )
    assert _plan_is_shuffle_free(df)
    target = spark.sparkContext.defaultParallelism
    spread = _spread_ids(df)
    assert spread.rdd.getNumPartitions() >= min(target, 10) or target <= 1


def test_spread_gate_declines_probe_on_shuffling_plans(spark):
    """Nodes outside the allowlist — including Deduplicate (rendered
    by .distinct(), absent from the old substring blocklist) and
    GlobalLimit — must make the gate pass the input through untouched
    (no eager AQE-stage probe, no repartition)."""
    from lightsaber_spark.functions.multimodal import (
        _plan_is_shuffle_free,
        _spread_ids,
    )

    shuffling = [
        spark.range(10).distinct(),                      # Deduplicate
        spark.range(10).groupBy("id").count(),           # Aggregate
        spark.range(10).orderBy("id"),                   # Sort
        spark.range(10).limit(3),                        # GlobalLimit
        spark.range(10).repartition(4),                  # Repartition
    ]
    for df in shuffling:
        assert not _plan_is_shuffle_free(df), df._jdf.queryExecution().analyzed().toString()
        assert _spread_ids(df) is df


def test_spread_gate_allows_scan_filter_projection(spark, tables):
    from lightsaber_spark.functions.multimodal import _plan_is_shuffle_free

    docs = tables["documents"]
    assert _plan_is_shuffle_free(docs.select("doc_id"))
    assert _plan_is_shuffle_free(docs.filter("doc_id > 3").select("doc_id"))
