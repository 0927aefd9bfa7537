"""aHash image near-dup (functions/image_dedup.py): Python-model
equality, planted near-duplicate recovery, and banding losslessness."""

from __future__ import annotations

import random

import pytest

from lightsaber_spark.functions.image_dedup import ahash_bits


def _image(seed: int, w: int = 24, h: int = 20) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h))


def _perturb(px: bytes, seed: int, n_px: int) -> bytes:
    """Flip n_px random pixels to new random values."""
    rng = random.Random(seed)
    out = bytearray(px)
    for _ in range(n_px):
        out[rng.randrange(len(out))] = rng.randrange(256)
    return bytes(out)


@pytest.fixture(scope="module")
def media(spark):
    from lightsaber_spark.functions.multimodal import encode_png

    w, h = 24, 20
    rows = []
    # 10 distinct base images; ids 0..9
    for i in range(10):
        rows.append((i, encode_png(_image(i, w, h), w, h), "image/png"))
    # near-dups of bases 0..2: ids 100..102 (light perturbation)
    for i in range(3):
        px = _perturb(_image(i, w, h), seed=1000 + i, n_px=4)
        rows.append((100 + i, encode_png(px, w, h), "image/png"))
    return spark.createDataFrame(
        rows, "media_id LONG, data BINARY, mime STRING"
    )


def test_ahash_matches_python_model(spark, media):
    from lightsaber_spark.functions.image_dedup import ahash_media
    from lightsaber_spark.functions.multimodal import decode_png

    got = {r["media_id"]: r["ahash"] for r in ahash_media(media).collect()}
    for row in media.collect():
        w, h, px = decode_png(bytes(row["data"]))
        assert got[row["media_id"]] == ahash_bits(px, w, h)


def test_ahash_near_dup_recovers_planted_pairs(spark, media):
    from lightsaber_spark.functions.image_dedup import ahash_near_dup

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dup(media, max_hamming=6).collect()
    }
    # every planted near-dup recovered…
    for i in range(3):
        assert (i, 100 + i) in pairs, (i, pairs)
    # …and no pairing between distinct random bases
    for a, b in pairs:
        assert b == a + 100, f"false positive {a, b}"


def test_ahash_banding_is_lossless(spark, media):
    """Banded retrieval == brute-force hamming filter over all pairs
    (pigeonhole: hamming <= 6 < 8 bands forces a full-band match)."""
    from pyspark.sql import functions as F

    from lightsaber_spark.functions.image_dedup import (
        ahash_media,
        ahash_near_dup,
    )

    sig = ahash_media(media)
    a = sig.select(F.col("media_id").alias("id_a"), F.col("ahash").alias("ha"))
    b = sig.select(F.col("media_id").alias("id_b"), F.col("ahash").alias("hb"))
    brute = (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("bigint"))
        .where(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )
    got = sorted(map(tuple, ahash_near_dup(media, max_hamming=6).collect()))
    want = sorted(map(tuple, brute.collect()))
    assert got == want


def test_ahash_rejects_lossy_threshold(spark, media):
    from lightsaber_spark.functions.image_dedup import ahash_near_dup

    with pytest.raises(ValueError):
        ahash_near_dup(media, max_hamming=8)


@pytest.mark.parametrize("max_h,n_bands,n_bits", [(6, 8, 64), (3, 4, 32), (0, 8, 64), (7, 8, 64)])
def test_banded_hamming_lossless_random_signatures(spark, max_h, n_bands, n_bits):
    """banded_hamming_pairs == brute force on seeded random signatures,
    across band counts, widths, and thresholds incl. the 0 and
    n_bands-1 boundaries — the pigeonhole losslessness claim tested
    directly on the shared helper, independent of any media fixture."""
    from pyspark.sql import functions as F

    from lightsaber_spark.functions.hamming import banded_hamming_pairs

    rng = random.Random(max_h * 1000 + n_bands)
    lo, hi = -(1 << 63), (1 << 63) - 1
    sigs = [rng.randint(lo, hi) for _ in range(30)]
    # plant near-identical values so small distances actually occur
    sigs += [s ^ (1 << rng.randrange(n_bits)) for s in sigs[:8]]
    if n_bits < 64:
        sigs = [s & ((1 << n_bits) - 1) for s in sigs]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "sid LONG, sig LONG"
    )
    got = sorted(map(tuple, banded_hamming_pairs(
        df, "sid", "sig", n_bits=n_bits, n_bands=n_bands, max_hamming=max_h
    ).collect()))
    a = df.select(F.col("sid").alias("id_a"), F.col("sig").alias("sa"))
    b = df.select(F.col("sid").alias("id_b"), F.col("sig").alias("sb"))
    want = sorted(map(tuple, (
        a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.expr("bit_count(sa ^ sb)").cast("bigint"))
        .where(F.col("hamming") <= max_h)
        .select("id_a", "id_b", "hamming").collect()
    )))
    assert got == want
