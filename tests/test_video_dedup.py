"""Frame-aligned video near-dup (functions/video_dedup.py)."""

from __future__ import annotations

import random

import pytest

from tests.test_image_dedup import _image, _perturb


def _clip_frames(seed: int, n_frames: int = 6, w: int = 24, h: int = 20):
    return [_image(seed * 100 + f, w, h) for f in range(n_frames)]


@pytest.fixture(scope="module")
def media(spark):
    from lightsaber_spark.functions.multimodal import encode_png, encode_video

    w, h = 24, 20
    rows = []
    for i in range(6):  # distinct base clips, ids 0..5
        frames = [encode_png(px, w, h) for px in _clip_frames(i)]
        rows.append((i, encode_video(frames), "video/x-lsvc"))
    for i in range(2):  # per-frame perturbed copies of clips 0-1
        frames = [
            encode_png(_perturb(px, 900 + i * 10 + f, 4), w, h)
            for f, px in enumerate(_clip_frames(i))
        ]
        rows.append((100 + i, encode_video(frames), "video/x-lsvc"))
    # a half-overlap clip: first 3 frames from clip 2, rest new — ids 200
    half = [encode_png(px, w, h) for px in _clip_frames(2)[:3]] + [
        encode_png(_image(7000 + f, w, h), w, h) for f in range(3)
    ]
    rows.append((200, encode_video(half), "video/x-lsvc"))
    return spark.createDataFrame(
        rows, "media_id LONG, data BINARY, mime STRING"
    )


def test_frame_hashes_match_python_model(spark, media):
    from lightsaber_spark.functions.image_dedup import ahash_bits
    from lightsaber_spark.functions.multimodal import decode_png, decode_video
    from lightsaber_spark.functions.video_dedup import frame_hashes

    got = {
        (r["media_id"], r["frame_idx"]): r["ahash"]
        for r in frame_hashes(media).collect()
    }
    for row in media.collect():
        for i, fr in enumerate(decode_video(bytes(row["data"]))):
            w, h, px = decode_png(fr)
            assert got[(row["media_id"], i)] == ahash_bits(px, w, h)


def test_video_near_dup_recovers_planted_pairs(spark, media):
    from lightsaber_spark.functions.video_dedup import video_near_dup

    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in video_near_dup(media, max_hamming=6, min_frac=0.5).collect()
    }
    # perturbed copies recovered with every frame matching
    for i in range(2):
        assert (i, 100 + i) in pairs
        assert pairs[(i, 100 + i)]["n_matching_frames"] == 6
    # the half-overlap clip matches clip 2 at exactly 3/6 frames
    assert (2, 200) in pairs
    assert pairs[(2, 200)]["n_matching_frames"] == 3
    # nothing else pairs
    assert set(pairs) == {(0, 100), (1, 101), (2, 200)}


def test_video_min_frac_excludes_partial_overlap(spark, media):
    from lightsaber_spark.functions.video_dedup import video_near_dup

    pairs = {
        (r["id_a"], r["id_b"])
        for r in video_near_dup(media, max_hamming=6, min_frac=0.9).collect()
    }
    assert (2, 200) not in pairs
    assert {(0, 100), (1, 101)} <= pairs
