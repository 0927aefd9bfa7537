"""Audio near-duplicate detection via energy-delta fingerprints.

The audio-side member of the near-dup family (images:
``image_dedup.py`` aHash; text: MinHash/SimHash; embeddings: LSH/IVF).
A clip's fingerprint is the sign pattern of consecutive frame-energy
deltas — the core idea of spectral/energy audio fingerprinting
(cf. Haitsma & Kalker 2002's sub-band energy-difference fingerprint),
reduced to its integer-exact essence so the Python model in the tests
reproduces it bit for bit:

- frame the PCM16 samples into fixed windows of ``frame`` samples;
- frame energy = sum of squared samples (exact int, ≤ 2^31·frame);
- fingerprint bit i = 1 iff energy[i+1] > energy[i], over the first
  ``n_bits`` deltas (shorter clips leave trailing bits 0).

Small waveform perturbations move energies slightly but rarely flip a
delta's SIGN when the envelope varies strongly — so near-identical
clips land within a few Hamming bits while unrelated clips sit near
n_bits/2. Retrieval + verification reuse the shared pigeonhole-banded
Hamming join (``functions/hamming.py``) — equi-joins only, the 100 TB
shape. Pytest-pinned (Python model + planted-pair recovery); no SQL
oracle is possible because the fingerprint consumes decoded WAV bytes
(same rationale as the multimodal decode queries).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from lightsaber_spark.functions.multimodal import decode_wav

FINGERPRINT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fingerprint", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def energy_fingerprint(
    samples: list[int], frame: int = 256, n_bits: int = 32
) -> tuple[int, int]:
    """(fingerprint, n_frames) of a PCM16 clip — see module docstring.
    Pure integer; fingerprint fits a signed 64 for n_bits <= 63."""
    energies = []
    for i in range(0, len(samples) - frame + 1, frame):
        s = 0
        for x in samples[i : i + frame]:
            s += x * x
        energies.append(s)
    bits = 0
    for i in range(min(n_bits, len(energies) - 1)):
        if energies[i + 1] > energies[i]:
            bits |= 1 << i
    return bits, len(energies)


def fingerprint_media(
    media: DataFrame, frame: int = 256, n_bits: int = 32
) -> DataFrame:
    """(media_id, fingerprint, n_frames) per WAV blob of a MEDIA_SCHEMA
    frame, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps, nf = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                _rate, _n, samples = decode_wav(bytes(blob))
                fp, frames = energy_fingerprint(samples, frame, n_bits)
                ids.append(int(mid))
                fps.append(fp)
                nf.append(frames)
            yield pd.DataFrame(
                {"media_id": ids, "fingerprint": fps, "n_frames": nf}
            )

    return media.mapInPandas(batches, FINGERPRINT_SCHEMA)


def synthetic_wav_fingerprint(
    df: DataFrame, id_col: str = "doc_id", frame: int = 256, n_bits: int = 32
) -> DataFrame:
    """FUSED synthetic-WAV encode→decode→fingerprint in ONE Python
    pass — the audio twin of ``image_dedup.synthetic_png_ahash``
    (guide §4.1/§8): the RIFF blob never crosses the JVM↔Python
    boundary; the real codec still runs end-to-end per clip
    (``encode_wav`` bytes → verifying ``decode_wav`` →
    :func:`energy_fingerprint`). Bit-identical to
    ``fingerprint_media(synthetic_wav_media(df), frame, n_bits)``
    (FINGERPRINT_SCHEMA) — pinned by the fusion-equivalence test."""
    from lightsaber_spark.functions.multimodal import (
        _spread_ids,
        _synth_wav_blob,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps, nf = [], [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                _rate, _n, samples = decode_wav(_synth_wav_blob(mid))
                fp, frames = energy_fingerprint(samples, frame, n_bits)
                ids.append(mid)
                fps.append(fp)
                nf.append(frames)
            yield pd.DataFrame(
                {"media_id": ids, "fingerprint": fps, "n_frames": nf}
            )

    return _spread_ids(df.select(id_col)).mapInPandas(batches, FINGERPRINT_SCHEMA)


def audio_near_dup(
    media: DataFrame,
    max_hamming: int = 3,
    frame: int = 256,
    n_bits: int = 32,
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate clip pairs (id_a < id_b, hamming <= max_hamming)
    by banded energy-delta fingerprints — lossless for
    ``max_hamming < n_bands`` (pigeonhole, functions/hamming.py)."""
    from lightsaber_spark.functions.hamming import banded_hamming_pairs

    sig = fingerprint_media(media, frame, n_bits)
    return banded_hamming_pairs(
        sig, "media_id", "fingerprint", n_bits=n_bits, n_bands=n_bands,
        max_hamming=max_hamming,
    )
