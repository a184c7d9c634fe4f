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
import math
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "AUDIO_META_TYPE",
    "IMAGE_META_TYPE",
    "PCM_STATS_TYPE",
    "VIDEO_META_TYPE",
    "audio_meta",
    "image_meta",
    "media_fingerprint",
    "sample_frames",
    "synth_wav_pcm16",
    "video_meta",
    "wav_pcm_stats",
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
            # int32 fields: height < 0 is the legal top-down layout,
            # but width <= 0 (or height 0) is a malformed header —
            # leave dims null rather than surface a negative size
            if width > 0 and height != 0:
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


PCM_STATS_TYPE = T.StructType(
    [
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("clip_ratio", T.DoubleType(), True),
    ]
)

_NULL_PCM = {
    "n_samples": None,
    "sample_rate": None,
    "rms": None,
    "peak": None,
    "clip_ratio": None,
}


def _le_hex_int(c: Column, n_bytes: int) -> Column:
    """Hex string of ``c`` as ``n_bytes`` little-endian bytes (input
    must already be non-negative and fit the width)."""
    parts = [
        F.lpad(
            F.hex(F.shiftright(c.cast("long"), 8 * j).bitwiseAND(F.lit(255))),
            2,
            "0",
        )
        for j in range(n_bytes)
    ]
    return F.concat(*parts)


def synth_wav_pcm16(samples: Column, sample_rate: int = 16000) -> Column:
    """Encode an ``array<int>`` of PCM16 samples (each in
    [-32768, 32767]) as a complete mono RIFF/WAVE binary — 100% JVM
    built-ins (hex assembly + ``unhex``), no UDF.

    This is the encode half of a fully engine-replayable audio
    round-trip: a query can synthesize samples from a deterministic
    formula, pack them into real WAV bytes here, decode them with
    :func:`wav_pcm_stats`, and an oracle recomputes the same stats
    from the formula alone — any header-layout or endianness bug on
    either side breaks the match. Also the test-fixture generator for
    the audio metadata path."""
    n = F.size(samples).cast("long")
    rate = F.lit(int(sample_rate)).cast("long")
    data_hex = F.concat_ws(
        "",
        F.transform(
            samples,
            lambda s: _le_hex_int(s.cast("long").bitwiseAND(F.lit(65535)), 2),
        ),
    )
    header_hex = F.concat(
        F.lit("52494646"),                      # "RIFF"
        _le_hex_int(F.lit(36).cast("long") + n * 2, 4),
        F.lit("57415645"),                      # "WAVE"
        F.lit("666D7420"),                      # "fmt "
        _le_hex_int(F.lit(16), 4),              # fmt chunk size
        _le_hex_int(F.lit(1), 2),               # PCM
        _le_hex_int(F.lit(1), 2),               # mono
        _le_hex_int(rate, 4),
        _le_hex_int(rate * 2, 4),               # byte rate
        _le_hex_int(F.lit(2), 2),               # block align
        _le_hex_int(F.lit(16), 2),              # bits/sample
        F.lit("64617461"),                      # "data"
        _le_hex_int(n * 2, 4),
    )
    return F.unhex(F.concat(header_hex, data_hex)).alias("wav")


def _wav_pcm16_array(data: bytes | None):
    """Decode the PCM16 payload of a RIFF/WAVE binary to
    ``(int16 numpy array, sample_rate)``, or None when the bytes
    aren't uncompressed 16-bit PCM (compressed codecs,
    truncated/garbage headers). Data bytes beyond the container are
    clipped; an odd trailing byte is dropped. The sample rate comes
    from the fmt chunk already unpacked here — the stats path must
    not re-sweep (or re-hash) the blob through the metadata parser."""
    import numpy as np

    if data is None or len(data) < 12:
        return None
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    payload = None
    while i + 8 <= len(data):
        chunk_id = data[i : i + 4]
        chunk_size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if chunk_id == b"fmt " and chunk_size >= 16 and i + 24 <= len(data):
            fmt = struct.unpack("<HHIIHH", data[i + 8 : i + 24])
        elif chunk_id == b"data" and chunk_size != 0xFFFFFFFF:
            off = i + 8
            size = min(chunk_size, len(data) - off)
            payload = (off, size - (size % 2))
        i += 8 + chunk_size + (chunk_size % 2)
    if fmt is None or payload is None:
        return None
    audio_format, _, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        return None
    off, size = payload
    return (
        np.frombuffer(data, dtype="<i2", count=size // 2, offset=off),
        int(rate),
    )


def wav_pcm_stats(col: Column | str) -> Column:
    """REAL audio decode — no codec library required: parse the
    RIFF container, reinterpret the PCM16 payload via numpy, and
    reduce to loudness/health stats
    ``(n_samples, sample_rate, rms, peak, clip_ratio)``:

    - ``rms`` = sqrt(sum(s^2)/n) — integer square-sum (exact), one
      double division + sqrt, so any engine replays it bit-for-bit.
    - ``peak`` = max(|s|) (32768 possible: |INT16_MIN|).
    - ``clip_ratio`` = fraction of samples at or beyond ±32767 —
      the clipping-damage gate for audio corpus curation.

    Non-PCM/garbled payloads yield an all-null struct. Arrow-batched
    pandas UDF over the binary column (map-only, fused into the
    scan); multi-channel data counts interleaved samples."""
    import numpy as np

    def stats(data: bytes | None) -> dict:
        decoded = _wav_pcm16_array(data)
        if decoded is None or len(decoded[0]) == 0:
            return dict(_NULL_PCM)
        arr, rate = decoded
        s = arr.astype(np.int64)
        n = len(s)
        ss = int((s * s).sum())
        return {
            "n_samples": n,
            "sample_rate": rate,
            "rms": float(math.sqrt(ss / n)),
            "peak": int(np.abs(s).max()),
            "clip_ratio": float(int((np.abs(s) >= 32767).sum()) / n),
        }

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in batches:
            yield pd.DataFrame(
                [stats(data) for data in series], columns=list(_NULL_PCM)
            )

    c = F.col(col) if isinstance(col, str) else col
    return F.pandas_udf(fn, PCM_STATS_TYPE)(c).alias("pcm_stats")


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


VIDEO_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

_NULL_VIDEO = {f.name: None for f in VIDEO_META_TYPE.fields}

# ISO-BMFF container boxes whose payload is itself a box sequence
_BMFF_CONTAINERS = frozenset({b"moov", b"trak", b"mdia", b"minf", b"stbl"})


def _iter_boxes(data: bytes, start: int, end: int):
    """Walk an ISO-BMFF box sequence: yields ``(type, payload_start,
    payload_end)``. size==1 -> 64-bit largesize follows the type;
    size==0 -> box extends to the end of the enclosing scope. Stops on
    any malformed size rather than guessing."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", data[i : i + 4])[0]
        box_type = data[i + 4 : i + 8]
        header = 8
        if size == 1:
            if i + 16 > end:
                return
            size = struct.unpack(">Q", data[i + 8 : i + 16])[0]
            header = 16
        elif size == 0:
            size = end - i
        if size < header or i + size > end:
            return
        yield box_type, i + header, i + size
        i += size


def _parse_mp4(data: bytes, meta: dict) -> dict:
    """MP4 / ISO-BMFF bytes-level parse: major brand (ftyp), duration
    (moov/mvhd: duration/timescale, v0 and v1 layouts), track count
    (trak boxes), and video dims (largest non-zero tkhd width/height,
    stored as 16.16 fixed point)."""
    meta["format"] = "mp4"
    n_tracks = 0
    width = height = 0
    for box_type, s, e in _iter_boxes(data, 0, len(data)):
        if box_type == b"ftyp" and e - s >= 4:
            brand = data[s : s + 4].decode("ascii", "replace").strip()
            meta["codec"] = brand or None
        elif box_type == b"moov":
            for inner, is_, ie in _iter_boxes(data, s, e):
                if inner == b"mvhd" and ie - is_ >= 4:
                    version = data[is_]
                    if version == 1 and ie - is_ >= 32:
                        timescale = struct.unpack(
                            ">I", data[is_ + 20 : is_ + 24]
                        )[0]
                        duration = struct.unpack(
                            ">Q", data[is_ + 24 : is_ + 32]
                        )[0]
                    elif version == 0 and ie - is_ >= 20:
                        timescale, duration = struct.unpack(
                            ">II", data[is_ + 12 : is_ + 20]
                        )
                    else:
                        continue
                    if timescale:
                        meta["duration_s"] = duration / timescale
                elif inner == b"trak":
                    n_tracks += 1
                    for tb, ts_, te in _iter_boxes(data, is_, ie):
                        if tb != b"tkhd" or te - ts_ < 4:
                            continue
                        # width/height are the LAST 8 payload bytes
                        # (16.16 fixed point) in both tkhd versions
                        if te - ts_ >= 84:
                            w_fp, h_fp = struct.unpack(
                                ">II", data[te - 8 : te]
                            )
                            width = max(width, w_fp >> 16)
                            height = max(height, h_fp >> 16)
    if n_tracks:
        meta["n_tracks"] = n_tracks
    if width and height:
        meta["width"], meta["height"] = int(width), int(height)
    return meta


def _walk_ogg_pages(data: bytes):
    """Yield ``(header_type, serial, granule, body_start, body_end)``
    for each structurally-valid Ogg page, advancing by the segment
    table's lacing values — a real page walk, not a byte scan
    (``find(b"OggS")`` can false-positive inside packet payloads).
    Stops at the first malformed page rather than guessing."""
    pos = 0
    n = len(data)
    while pos + 27 <= n and data[pos : pos + 4] == b"OggS" and data[pos + 4] == 0:
        n_segs = data[pos + 26]
        table_end = pos + 27 + n_segs
        if table_end > n:
            return
        body_len = sum(data[pos + 27 : table_end])
        serial = struct.unpack("<I", data[pos + 14 : pos + 18])[0]
        granule = struct.unpack("<q", data[pos + 6 : pos + 14])[0]
        yield (
            data[pos + 5],
            serial,
            granule,
            table_end,
            min(table_end + body_len, n),
        )
        pos = table_end + body_len


def _parse_ogg(data: bytes, meta: dict) -> dict:
    """Ogg bytes-level parse: logical streams counted via BOS pages,
    codec + stream parameters from the first identification packet
    (Theora video dims, Vorbis/Opus channels+rate), duration from the
    last finished-packet granule OF THAT SAME logical stream (matched
    by page serial number — in a muxed file another stream's granule
    is in a different unit) over the id header's rate (Vorbis granule
    = PCM samples; Opus granule is 48 kHz by spec; Theora needs the
    granule shift — left null there)."""
    meta["format"] = "ogg"
    n_bos = 0
    first_serial: int | None = None
    first_body: int | None = None
    last_granule = None
    for header_type, serial, granule, body_start, _ in _walk_ogg_pages(data):
        if header_type & 0x02:
            n_bos += 1
        if first_serial is None:
            first_serial, first_body = serial, body_start
        if serial == first_serial and granule > 0:
            # -1 = no packet finishes on this page
            last_granule = granule
    if n_bos:
        meta["n_tracks"] = n_bos
    if first_body is not None:
        body = first_body
        rate = None
        if data[body : body + 7] == b"\x80theora" and len(data) >= body + 20:
            meta["codec"] = "theora"
            picw = int.from_bytes(data[body + 14 : body + 17], "big")
            pich = int.from_bytes(data[body + 17 : body + 20], "big")
            if picw and pich:
                meta["width"], meta["height"] = picw, pich
        elif data[body : body + 7] == b"\x01vorbis" and len(data) >= body + 16:
            meta["codec"] = "vorbis"
            rate = struct.unpack("<I", data[body + 12 : body + 16])[0]
        elif data[body : body + 8] == b"OpusHead":
            meta["codec"] = "opus"
            rate = 48_000  # Opus granule positions are 48 kHz by spec
        if rate and last_granule:
            meta["duration_s"] = last_granule / rate
    return meta


def _parse_video_header(data: bytes | None) -> dict | None:
    """Bytes-level video container sniffing (MP4/ISO-BMFF box walk,
    Ogg page scan) — the deterministic stub backend, same discipline as
    :func:`_parse_wav_header`. Real frame decoding requires a codec
    library and stays behind :func:`sample_frames`' stub note.
    Unrecognized containers yield bytes-level fields only."""
    if data is None:
        return None
    meta = dict(_NULL_VIDEO)
    meta["n_bytes"] = len(data)
    meta["sha256"] = hashlib.sha256(data).hexdigest()
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return _parse_mp4(data, meta)
    if data.startswith(b"OggS") and len(data) >= 27 and data[4] == 0:
        return _parse_ogg(data, meta)
    return meta


def video_meta(col: Column | str) -> Column:
    """Extract typed metadata from a video binary column (MP4 box walk
    and Ogg page scan parsed for real at the bytes level; elementary
    streams yield bytes-level fields only). Arrow-batched pandas UDF;
    null binary -> all-null fields."""

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in batches:
            yield pd.DataFrame(
                [_parse_video_header(data) or _NULL_VIDEO for data in series],
                columns=list(_NULL_VIDEO),
            )

    c = F.col(col) if isinstance(col, str) else col
    return F.pandas_udf(fn, VIDEO_META_TYPE)(c).alias("video_meta")


def media_fingerprint(col: Column | str) -> Column:
    """Exact-dedup key for binary payloads — built-in sha2 over the
    bytes, no UDF (works on any media type)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256).alias("media_fingerprint")


def _stub_frames(
    data: bytes, every_n_bytes: int, max_frames: int
) -> list[dict]:
    """Deterministic byte-stride sampling — the dependency-free stand-in
    that exercises the identical Spark plumbing (schema, explode
    patterns, batch shape)."""
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


def _pillow_frames(data: bytes, max_frames: int) -> list[dict]:
    """Real pixel decode via Pillow: one entry per frame (animated
    formats seek frame by frame; still images yield one), digest over
    the decoded RGB pixel bytes — so two byte-different encodings of
    the SAME pixels fingerprint identically, which the byte-stride
    stub cannot do. ``offset`` carries the source frame number (no
    byte position survives decoding). Undecodable bytes -> []; a
    mid-stream decode error (truncated animation) keeps the frames
    already decoded rather than discarding them."""
    import io

    from PIL import Image

    out = []
    try:
        with Image.open(io.BytesIO(data)) as im:
            for i in range(max_frames):
                try:
                    im.seek(i)
                except EOFError:
                    break
                rgb = im.convert("RGB")
                out.append(
                    {
                        "frame_index": i,
                        "offset": i,
                        "digest": hashlib.sha256(rgb.tobytes()).hexdigest()[
                            :16
                        ],
                    }
                )
    except Exception:
        return out
    return out


def _av_keyframes(data: bytes, max_frames: int) -> list[dict]:
    """Real keyframe extraction via PyAV: decode ONLY keyframes
    (``skip_frame = NONKEY`` — the demuxer skips non-key packets, so
    cost scales with keyframe count, not stream length), digest over
    the rgb24 pixel bytes, ``offset`` = presentation timestamp in
    stream time-base units. Undecodable bytes -> []."""
    import io

    import av

    out = []
    try:
        with av.open(io.BytesIO(data)) as container:
            stream = container.streams.video[0]
            stream.codec_context.skip_frame = "NONKEY"
            for i, frame in enumerate(container.decode(stream)):
                if i >= max_frames:
                    break
                arr = frame.to_ndarray(format="rgb24")
                out.append(
                    {
                        "frame_index": i,
                        "offset": int(
                            frame.pts if frame.pts is not None else i
                        ),
                        "digest": hashlib.sha256(
                            arr.tobytes()
                        ).hexdigest()[:16],
                    }
                )
    except Exception:
        return out  # keep keyframes decoded before a mid-stream error
    return out


def _frame_backend(backend: str):
    """Resolve the decode backend NAME at operator-construction time so
    a missing package fails loudly on the driver (the tokenizer-gate
    pattern), not as a per-row executor exception."""
    import importlib.util

    have_pil = importlib.util.find_spec("PIL") is not None
    have_av = importlib.util.find_spec("av") is not None
    if backend == "stub":
        return "stub"
    if backend == "pillow":
        if not have_pil:
            raise RuntimeError(
                "sample_frames(backend='pillow') requires the 'Pillow' "
                "package, which is not installed"
            )
        return "pillow"
    if backend == "av":
        if not have_av:
            raise RuntimeError(
                "sample_frames(backend='av') requires the 'av' (PyAV) "
                "package, which is not installed"
            )
        return "av"
    if backend == "auto":
        # prefer real decode when available; magic-byte routing per
        # row happens in the UDF
        if have_av or have_pil:
            return "auto:%s%s" % ("av" if have_av else "", "+pil" if have_pil else "")
        return "stub"
    raise ValueError(f"unknown sample_frames backend {backend!r}")


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    *,
    every_n_bytes: int = 1 << 16,
    max_frames: int = 8,
    output_col: str = "frames",
    backend: str = "stub",
) -> DataFrame:
    """Sample up to ``max_frames`` "frames" per media row as
    ``array<struct<frame_index, offset, digest>>``.

    Backends (the tokenizer-gate pattern — explicit choice fails
    loudly when the package is absent, the default never needs one):

    - ``"stub"`` (default): deterministic byte-stride sampling +
      window fingerprints — dependency-free and engine-portable, the
      path the driver oracle replays;
    - ``"pillow"``: real pixel decode (stills + animated formats),
      digest over decoded RGB bytes;
    - ``"av"``: real keyframe extraction via PyAV (``skip_frame =
      NONKEY``), digest over rgb24 pixel bytes;
    - ``"auto"``: route per row by magic bytes — video containers to
      PyAV, images to Pillow, anything else (or absent packages) to
      the stub.

    All backends share the schema, partitioning and Arrow batch shape,
    so swapping the stub for real decode changes NO Spark-side
    plumbing (plan-tested in tests/test_multimodal_streaming.py)."""
    mode = _frame_backend(backend)
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
            if mode == "pillow":
                return _pillow_frames(data, max_frames)
            if mode == "av":
                return _av_keyframes(data, max_frames)
            if mode.startswith("auto:"):
                is_video = (
                    len(data) >= 12 and data[4:8] == b"ftyp"
                ) or data.startswith(b"OggS")
                # either media class: real decode first, and anything
                # the real backend can't extract a single frame from
                # (corrupt/truncated payloads) falls through to the
                # stub — the documented 'auto' contract, symmetric for
                # video and images
                if is_video and "av" in mode.split(":")[1]:
                    got = _av_keyframes(data, max_frames)
                    if got:
                        return got
                elif not is_video and "pil" in mode:
                    got = _pillow_frames(data, max_frames)
                    if got:
                        return got
                return _stub_frames(data, every_n_bytes, max_frames)
            return _stub_frames(data, every_n_bytes, max_frames)

        for series in batches:
            yield series.map(sample)

    return df.withColumn(output_col, F.pandas_udf(fn, frame_type)(F.col(media_col)))
