"""Round-15 optimization equivalence pins.

Every optimization that changed an operator's internals gets a focused
bit-equality test against the unoptimized composition it replaced:

- fused single-Python-pass media pipelines (synthetic_png_decoded /
  synthetic_png_ahash / synthetic_wav_decoded /
  synthetic_wav_fingerprint / synthetic_video_frames) vs the original
  two-stage encode→transfer→decode chains;
- ``banded_hamming_pairs(carry_cols=...)`` vs re-joining the carried
  payload onto the pair table per side.

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
