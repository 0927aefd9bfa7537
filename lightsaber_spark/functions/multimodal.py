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
