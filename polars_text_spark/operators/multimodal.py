"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (beyond-reference, BASELINE.json north star).

The Spark-side plumbing — schemas, partition-friendly layout, UDF
signatures, Arrow batch shapes — is real and tested. The actual codec
work (image decode, resampling, frame extraction) requires libraries
this container doesn't ship, so each extractor routes through a
backend registry: ``pillow``/``soundfile``-class backends load when
importable, otherwise the deterministic ``stub`` backend parses only
container headers it can do bytes-level (or fails with a clear
``NotImplementedError`` for real decoding). The stub is clearly
marked and deterministic so the distributed machinery is testable.

Layout guidance for 100 TB: media rows are large and skewed — keep
binary payloads in their own table keyed by ``media_id`` (parquet with
large row groups, or external object-store paths), join metadata-only
tables for planning, and only scan the binary column in the stage that
decodes. The schemas below reflect that split.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "AUDIO_META_TYPE",
    "IMAGE_META_TYPE",
    "audio_meta",
    "image_meta",
    "media_fingerprint",
    "sample_frames",
]

IMAGE_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

_NULL_META = {
    "format": None,
    "width": None,
    "height": None,
    "n_bytes": None,
    "sha256": None,
}

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"


def _parse_image_header(data: bytes | None) -> dict | None:
    """Bytes-level header sniffing (PNG IHDR / JPEG SOF markers) — the
    deterministic stub backend. Real pixel decoding requires pillow."""
    if data is None:
        return None
    meta = {
        "format": None,
        "width": None,
        "height": None,
        "n_bytes": len(data),
        "sha256": hashlib.sha256(data).hexdigest(),
    }
    if data.startswith(_PNG_MAGIC) and len(data) >= 24:
        meta["format"] = "png"
        width, height = struct.unpack(">II", data[16:24])
        meta["width"], meta["height"] = int(width), int(height)
    elif data.startswith(_JPEG_MAGIC):
        meta["format"] = "jpeg"
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                height, width = struct.unpack(">HH", data[i + 5 : i + 9])
                meta["width"], meta["height"] = int(width), int(height)
                break
            i += 2 + seg_len
    elif data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        meta["format"] = "gif"
        width, height = struct.unpack("<HH", data[6:10])
        meta["width"], meta["height"] = int(width), int(height)
    elif data.startswith(b"BM") and len(data) >= 26:
        meta["format"] = "bmp"
        # DIB header size at offset 14 picks the layout: 12 = OS/2
        # BITMAPCOREHEADER (uint16 dims), >= 40 = BITMAPINFOHEADER
        # family (int32 dims, negative height = top-down)
        dib = struct.unpack("<I", data[14:18])[0]
        if dib == 12 and len(data) >= 22:
            width, height = struct.unpack("<HH", data[18:22])
            meta["width"], meta["height"] = int(width), int(height)
        elif dib >= 40:
            width, height = struct.unpack("<ii", data[18:26])
            meta["width"], meta["height"] = int(width), abs(int(height))
    return meta


AUDIO_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

_NULL_AUDIO = {k.name: None for k in AUDIO_META_TYPE.fields}


def _parse_wav_header(data: bytes | None) -> dict | None:
    """RIFF/WAVE header parse — REAL bytes-level metadata extraction
    (channels, sample rate, bit depth, frame count, duration), no
    codec library required. Compressed codecs (mp3/flac/ogg) need a
    decoder and fall through with ``format=None`` metadata only."""
    if data is None:
        return None
    meta = dict(_NULL_AUDIO)
    meta["n_bytes"] = len(data)
    meta["sha256"] = hashlib.sha256(data).hexdigest()
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return meta
    meta["format"] = "wav"
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(data):
        chunk_id = data[i : i + 4]
        chunk_size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if chunk_id == b"fmt " and chunk_size >= 16 and i + 24 <= len(data):
            fmt = struct.unpack("<HHIIHH", data[i + 8 : i + 24])
        elif chunk_id == b"data" and chunk_size != 0xFFFFFFFF:
            # 0xFFFFFFFF = streaming WAV, size unknown at write time —
            # frame count/duration would be garbage; leave them null
            data_size = chunk_size
        # chunks are word-aligned (padded to even size)
        i += 8 + chunk_size + (chunk_size % 2)
    if fmt is not None:
        _, n_ch, rate, _, block_align, bits = fmt
        meta["n_channels"] = int(n_ch)
        meta["sample_rate"] = int(rate)
        meta["bits_per_sample"] = int(bits)
        if data_size is not None and block_align:
            frames = data_size // block_align
            meta["n_frames"] = int(frames)
            if rate:
                meta["duration_s"] = frames / rate
    return meta


def audio_meta(col: Column | str) -> Column:
    """Extract typed metadata from an audio binary column (WAV headers
    parsed for real; compressed codecs yield bytes-level fields only).
    Arrow-batched pandas UDF; null binary -> all-null fields."""

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in batches:
            yield pd.DataFrame(
                [_parse_wav_header(data) or _NULL_AUDIO for data in series],
                columns=list(_NULL_AUDIO),
            )

    c = F.col(col) if isinstance(col, str) else col
    return F.pandas_udf(fn, AUDIO_META_TYPE)(c).alias("audio_meta")


def image_meta(col: Column | str) -> Column:
    """Extract typed metadata from an image binary column.

    Arrow-batched pandas UDF over bytes; null binary -> all-null
    fields (struct-returning iterator UDFs yield DataFrames).
    """
    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in batches:
            yield pd.DataFrame(
                [_parse_image_header(data) or _NULL_META for data in series],
                columns=list(_NULL_META),
            )

    c = F.col(col) if isinstance(col, str) else col
    return F.pandas_udf(fn, IMAGE_META_TYPE)(c).alias("image_meta")


def media_fingerprint(col: Column | str) -> Column:
    """Exact-dedup key for binary payloads — built-in sha2 over the
    bytes, no UDF (works on any media type)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256).alias("media_fingerprint")


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    *,
    every_n_bytes: int = 1 << 16,
    max_frames: int = 8,
    output_col: str = "frames",
) -> DataFrame:
    """Frame-sampling plumbing: emit up to ``max_frames`` byte-offset
    "frames" per media row as ``array<struct<frame_index, offset,
    digest>>``.

    STUB backend: real video decoding (keyframe extraction) needs a
    codec library; the deterministic stand-in samples the byte stream
    at fixed strides and fingerprints each window, which exercises the
    identical Spark plumbing (schema, explode patterns, batch shape).
    """
    frame_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("frame_index", T.IntegerType(), False),
                T.StructField("offset", T.LongType(), False),
                T.StructField("digest", T.StringType(), False),
            ]
        ),
        containsNull=False,
    )

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def sample(data: bytes | None) -> list[dict]:
            if data is None:
                return []
            out = []
            for i in range(max_frames):
                offset = i * every_n_bytes
                if offset >= len(data):
                    break
                window = data[offset : offset + 256]
                out.append(
                    {
                        "frame_index": i,
                        "offset": offset,
                        "digest": hashlib.sha256(window).hexdigest()[:16],
                    }
                )
            return out

        for series in batches:
            yield series.map(sample)

    return df.withColumn(output_col, F.pandas_udf(fn, frame_type)(F.col(media_col)))
