"""Perceptual-hash (average-hash) image near-duplicate detection.

The image-side member of the near-dup family (text: MinHash/SimHash in
``functions/dedup.py``; embeddings: ``functions/similarity.py``): a
64-bit aHash per image — 8×8 block-mean thresholded against the global
mean — then pigeonhole-banded retrieval (8 bands of 8 bits; Hamming ≤ 6
implies at least one of 8 byte-bands matches exactly... pigeonhole
guarantees a full-band match whenever hamming < #bands), with exact
``bit_count(xor)`` verification on candidates only. Same equi-join-
shaped retrieval as the SimHash path (``dedup.py:simhash_pairs``) — no
all-pairs product, the 100 TB shape.

Exactness: the hash uses only integer arithmetic — block bit = 1 iff
``block_sum * n_total >= total_sum * n_block`` (cross-multiplied mean
comparison, no division) — so the Python model in the tests reproduces
it bit-for-bit. No SQL oracle is possible (the hash consumes decoded
PNG pixels), so this ships pytest-pinned (Python-model equality +
planted near-dup recovery) rather than oracle-twinned — the same
weak-check rationale as the multimodal decode queries.

Decoding reuses the stdlib-only PNG codec in
``functions/multimodal.py`` (``decode_png``), Arrow-batched via
``mapInPandas``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from lightsaber_spark.functions.multimodal import decode_png

AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", LongType()),
    ]
)


def ahash_bits(pixels: bytes, width: int, height: int) -> int:
    """Pure-integer 64-bit average hash of an 8-bit grayscale image.

    Bit (by, bx) is set iff the mean of the block's pixels is >= the
    global mean, decided as ``block_sum * n_total >= total_sum *
    n_block`` so no division (or float) enters. Blocks partition the
    image via the standard ``floor(i*dim/8)`` grid; images smaller than
    8px on a side get empty blocks, whose bit is 0 (0 * n_total >=
    total_sum * 0 would be true — empty blocks are skipped instead).
    Returned as a SIGNED 64-bit value (two's complement) so it fits a
    Spark LongType."""
    n_total = width * height
    total = sum(pixels)
    bits = 0
    for by in range(8):
        y0, y1 = by * height // 8, (by + 1) * height // 8
        for bx in range(8):
            x0, x1 = bx * width // 8, (bx + 1) * width // 8
            n_blk = (y1 - y0) * (x1 - x0)
            if n_blk == 0:
                continue
            s = 0
            for y in range(y0, y1):
                row = y * width
                s += sum(pixels[row + x0 : row + x1])
            if s * n_total >= total * n_blk:
                bits |= 1 << (by * 8 + bx)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def ahash_media(media: DataFrame) -> DataFrame:
    """(media_id, ahash) per image of a MEDIA_SCHEMA frame (PNG blobs),
    Arrow-batched; decode + hash are pure Python/stdlib per batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                w, h, px = decode_png(bytes(blob))
                ids.append(int(mid))
                hashes.append(ahash_bits(px, w, h))
            yield pd.DataFrame({"media_id": ids, "ahash": hashes})

    return media.mapInPandas(batches, AHASH_SCHEMA)


def synthetic_png_ahash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """FUSED synthetic-PNG encode→decode→aHash in ONE Python pass
    (guide §4.1/§8): versus ``ahash_media(synthetic_png_media(df))``,
    which ships every PNG blob Python→JVM→Python (two worker pools, an
    Arrow transpose + transfer each way) purely to re-enter Python for
    the decode. The real codec still runs end-to-end per image
    (``encode_png`` bytes → ``decode_png`` with CRC verification →
    :func:`ahash_bits`); output is bit-identical to the two-stage
    chain (AHASH_SCHEMA) — pinned by the fusion-equivalence test."""
    from lightsaber_spark.functions.multimodal import (
        _spread_ids,
        _synth_png_blob,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h, px = decode_png(_synth_png_blob(mid))
                ids.append(mid)
                hashes.append(ahash_bits(px, w, h))
            yield pd.DataFrame({"media_id": ids, "ahash": hashes})

    return _spread_ids(df.select(id_col)).mapInPandas(batches, AHASH_SCHEMA)


def ahash_near_dup(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs (id_a < id_b, hamming <= max_hamming)
    by banded aHash retrieval: 8 byte-bands; a pair within Hamming 7 or
    less differs in at most 7 bits, so at least one band matches
    exactly (pigeonhole over 8 bands) — retrieval is equi-joins only,
    then exact ``bit_count(xor)`` verification on candidates.

    ``max_hamming`` must be < 8 for the banding to be lossless."""
    from lightsaber_spark.functions.hamming import banded_hamming_pairs

    sig = ahash_media(media)
    return banded_hamming_pairs(
        sig, "media_id", "ahash", n_bits=64, n_bands=8,
        max_hamming=max_hamming,
    )
