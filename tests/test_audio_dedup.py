"""Energy-delta audio fingerprints (functions/audio_dedup.py):
Python-model equality, planted near-dup recovery, banding
losslessness."""

from __future__ import annotations

import random

import pytest

from lightsaber_spark.functions.audio_dedup import energy_fingerprint


def _clip(seed: int, n_frames: int = 40, frame: int = 256) -> list[int]:
    """Strongly-varying amplitude envelope (per-frame level drawn from
    a wide range) so delta signs are robust to small perturbations."""
    rng = random.Random(seed)
    out = []
    for _ in range(n_frames):
        level = rng.choice([200, 800, 3000, 9000, 20000])
        out.extend(
            max(-32768, min(32767, int(rng.gauss(0, level))))
            for _ in range(frame)
        )
    return out


def _perturb(samples: list[int], seed: int, amp: int = 30) -> list[int]:
    rng = random.Random(seed)
    return [
        max(-32768, min(32767, s + rng.randrange(-amp, amp + 1)))
        for s in samples
    ]


@pytest.fixture(scope="module")
def media(spark):
    from lightsaber_spark.functions.multimodal import encode_wav

    rows = []
    for i in range(8):
        rows.append((i, encode_wav(_clip(i)), "audio/wav"))
    for i in range(3):
        rows.append(
            (100 + i, encode_wav(_perturb(_clip(i), 500 + i)), "audio/wav")
        )
    return spark.createDataFrame(
        rows, "media_id LONG, data BINARY, mime STRING"
    )


def test_fingerprint_matches_python_model(spark, media):
    from lightsaber_spark.functions.audio_dedup import fingerprint_media
    from lightsaber_spark.functions.multimodal import decode_wav

    got = {
        r["media_id"]: (r["fingerprint"], r["n_frames"])
        for r in fingerprint_media(media).collect()
    }
    for row in media.collect():
        _r, _n, samples = decode_wav(bytes(row["data"]))
        assert got[row["media_id"]] == energy_fingerprint(samples)


def test_audio_near_dup_recovers_planted_pairs(spark, media):
    from lightsaber_spark.functions.audio_dedup import audio_near_dup

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dup(media, max_hamming=3).collect()
    }
    for i in range(3):
        assert (i, 100 + i) in pairs, (i, pairs)
    for a, b in pairs:
        assert b == a + 100, f"false positive {a, b}"


def test_audio_banding_is_lossless(spark, media):
    from pyspark.sql import functions as F

    from lightsaber_spark.functions.audio_dedup import (
        audio_near_dup,
        fingerprint_media,
    )

    sig = fingerprint_media(media)
    a = sig.select(
        F.col("media_id").alias("id_a"), F.col("fingerprint").alias("fa")
    )
    b = sig.select(
        F.col("media_id").alias("id_b"), F.col("fingerprint").alias("fb")
    )
    brute = (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.expr("bit_count(fa ^ fb)").cast("bigint"))
        .where(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )
    got = sorted(map(tuple, audio_near_dup(media, max_hamming=3).collect()))
    want = sorted(map(tuple, brute.collect()))
    assert got == want
