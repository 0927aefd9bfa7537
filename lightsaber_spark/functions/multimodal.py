"""Multimodal (image/audio/video) column plumbing.

Beyond-parity surface: media travel as opaque ``binary`` columns with
typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only sanctioned Python hot path — one
serialization per batch, not per row; partition-parallel at 100 TB).

The actual codecs (Pillow/librosa/ffmpeg) are NOT in this container, so
the decode kernels here are **deterministic stubs**: they compute real
plumbing-relevant outputs (byte length, content digest, fake
dimensions derived from the bytes) and raise ``NotImplementedError``
when a real codec is requested. Swapping in a real decoder changes ONE
function body; schema, batching, and partitioning stay identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("data", BinaryType()),
    StructField("mime", StringType()),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("digest", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so
    the binary pipeline is exercisable on the shipped testdata."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _stub_decode(data: bytes) -> tuple[int, str, int, int]:
    """Deterministic fake decode: dimensions derived from byte length,
    digest from content. Replace with a real codec when available."""
    n = len(data)
    digest = hashlib.md5(data).hexdigest()
    width = n % 640 + 1
    height = (n // 640) % 480 + 1
    return n, digest, width, height


def decode_media(df: DataFrame, real_codec: bool = False) -> DataFrame:
    """Decode a media DataFrame (MEDIA_SCHEMA-shaped) to DECODED_SCHEMA
    via Arrow-batched mapInPandas.

    ``real_codec=True`` requires an image library that is not bundled
    → NotImplementedError (clearly-marked stub boundary)."""
    if real_codec:
        raise NotImplementedError(
            "no image/audio codec in this environment; stub decode only"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_stub_decode(bytes(d)) for d in pdf["data"]]
            out = pd.DataFrame(rows, columns=["n_bytes", "digest", "width", "height"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("out_bytes", IntegerType()),
    StructField("digest", StringType()),
])


def resize_media(df: DataFrame, target_bytes: int = 32) -> DataFrame:
    """Deterministic stub "resize": stride-sample the payload down to
    ``target_bytes`` (byte i of the output = input byte ⌊i·n/target⌋) —
    the plumbing shape of a thumbnail/downsample kernel. A real image
    resize replaces the sampling line; batching, schema, and digest
    verification stay identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, outs, digs = [], [], []
            for mid, d in zip(pdf["media_id"], pdf["data"]):
                b = bytes(d)
                n = len(b)
                small = bytes(b[i * n // target_bytes] for i in range(target_bytes)) \
                    if n >= 1 else b""
                ids.append(mid)
                outs.append(len(small))
                digs.append(hashlib.md5(small).hexdigest())
            yield pd.DataFrame({"media_id": ids, "out_bytes": outs, "digest": digs})

    return df.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("digest", StringType()),
])


def sample_frames(df: DataFrame, frame_size: int = 64, every_n: int = 2) -> DataFrame:
    """Deterministic stub frame sampler: the payload is treated as
    consecutive ``frame_size``-byte frames (last frame may be short);
    every ``every_n``-th frame is emitted with its index and digest —
    the video-keyframe-extraction plumbing shape (one input row → many
    frame rows, mapInPandas)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, d in zip(pdf["media_id"], pdf["data"]):
                b = bytes(d)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_n):
                    fr = b[i * frame_size : (i + 1) * frame_size]
                    rows.append((mid, i, len(fr), hashlib.md5(fr).hexdigest()))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "n_bytes", "digest"]
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("feature", StructType([
        StructField(f"f{i}", LongType()) for i in range(FEATURE_DIM)
    ])),
])


def extract_features(df: DataFrame) -> DataFrame:
    """Deterministic stub feature extractor: 16 bigint features from the
    md5 digest of the payload (stands in for an embedding model; the
    mapInPandas batch shape and schema are what a real model would use)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for d in pdf["data"]:
                h = hashlib.md5(bytes(d)).digest()
                feats.append(tuple(int.from_bytes(h[i:i + 1], "big") for i in range(FEATURE_DIM)))
            out = pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "feature": feats,
            })
            yield out

    return df.mapInPandas(batches, FEATURE_SCHEMA)
