"""Video near-duplicate detection: frame-aligned perceptual hashing.

Completes the multimodal near-dup triple (images: ``image_dedup.py``,
audio: ``audio_dedup.py``): demux the LSVC container
(``multimodal.py:decode_video``), aHash every frame
(``image_dedup.ahash_bits`` — pure-integer, Python-model-reproducible),
then pair clips whose CO-POSITIONED frames fall within a Hamming
threshold — the aligned-re-encode case (same cut, different
compression/touch-ups), which is the overwhelmingly common duplicate
class in crawled video.

Retrieval is the shared pigeonhole-banded Hamming equi-join keyed
additionally by ``frame_idx`` (``hamming.py:banded_hamming_pairs``
``align_cols``), so only co-positioned frames ever meet — at corpus
scale the join key (frame_idx, band, bucket) keeps bucket sizes small
even for billions of frames. Clip-level near-dups are frame-pair
aggregates: a pair qualifies when at least ``min_frac`` of the
shorter clip's frames match.

Pytest-pinned (Python model + planted-pair recovery); no SQL oracle is
possible — the hashes consume demuxed, PNG-decoded pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from lightsaber_spark.functions.image_dedup import ahash_bits
from lightsaber_spark.functions.multimodal import decode_png, decode_video

FRAME_HASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ahash", LongType()),
    ]
)


def frame_hashes(media: DataFrame) -> DataFrame:
    """(media_id, frame_idx, ahash) per frame of every LSVC blob —
    the one-row→many-frames mapInPandas shape of
    ``multimodal.sample_frames_real`` with the stats replaced by the
    perceptual hash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                for i, fr in enumerate(decode_video(bytes(blob))):
                    w, h, px = decode_png(fr)
                    rows.append((int(mid), i, ahash_bits(px, w, h)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ahash"]
            )

    return media.mapInPandas(batches, FRAME_HASH_SCHEMA)


def video_near_dup(
    media: DataFrame,
    max_hamming: int = 6,
    min_frac: float = 0.5,
) -> DataFrame:
    """Near-duplicate clip pairs: (id_a < id_b, n_matching_frames,
    n_frames_min, match_frac). Frame pairs retrieved banded and
    frame-aligned; a clip pair qualifies when matching frames cover at
    least ``min_frac`` of the shorter clip (scaled-integer compare, no
    float threshold ambiguity)."""
    from lightsaber_spark.functions.hamming import banded_hamming_pairs

    fh = frame_hashes(media)
    counts = fh.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames")
    )
    frame_pairs = banded_hamming_pairs(
        fh, "media_id", "ahash", n_bits=64, n_bands=8,
        max_hamming=max_hamming, align_cols=("frame_idx",),
    )
    pair_counts = frame_pairs.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matching_frames")
    )
    ca = counts.select(
        F.col("media_id").alias("id_a"), F.col("n_frames").alias("n_a")
    )
    cb = counts.select(
        F.col("media_id").alias("id_b"), F.col("n_frames").alias("n_b")
    )
    thr = int(round(min_frac * 1000000))
    return (
        pair_counts.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn("n_frames_min", F.least("n_a", "n_b"))
        .where(
            F.col("n_matching_frames") * 1000000
            >= F.lit(thr) * F.col("n_frames_min")
        )
        .select(
            "id_a",
            "id_b",
            "n_matching_frames",
            "n_frames_min",
            (
                F.col("n_matching_frames") / F.col("n_frames_min")
            ).alias("match_frac"),
        )
    )
