"""Multimodal binary-column plumbing + Structured Streaming tests."""

from __future__ import annotations

import struct
import time
import zlib

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.multimodal import (
    image_meta,
    media_fingerprint,
    sample_frames,
)
from polars_text_spark.sources.catalog import load_events
from polars_text_spark.streaming.events import (
    read_events_stream,
    windowed_event_counts,
)


def _tiny_png(width: int, height: int) -> bytes:
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def test_image_meta_stub_backend(spark):
    rows = [
        (1, bytearray(_tiny_png(640, 480))),
        (2, bytearray(b"\xff\xd8\xff\xe0garbage-not-a-full-jpeg")),
        (3, bytearray(b"not an image at all")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id: long, media: binary")
    got = {r.media_id: r.m for r in df.select("media_id", image_meta("media").alias("m")).collect()}
    assert got[1].format == "png" and (got[1].width, got[1].height) == (640, 480)
    assert got[2].format == "jpeg" and got[2].width is None  # truncated header
    assert got[3].format is None and got[3].n_bytes == 19
    assert got[4].format is None and got[4].n_bytes is None


def test_media_fingerprint_dedup_and_frames(spark):
    payload = bytes(range(256)) * 1024  # 256 KiB
    rows = [(1, bytearray(payload)), (2, bytearray(payload)), (3, bytearray(b"x" * 10))]
    df = spark.createDataFrame(rows, "media_id: long, media: binary")
    fps = {r.media_id: r.media_fingerprint for r in df.select("media_id", media_fingerprint("media")).collect()}
    assert fps[1] == fps[2] != fps[3]

    framed = {r.media_id: r.frames for r in sample_frames(df).select("media_id", "frames").collect()}
    assert len(framed[1]) == 4  # 256 KiB / 64 KiB stride
    assert [f.frame_index for f in framed[1]] == [0, 1, 2, 3]
    assert framed[1] == framed[2]  # deterministic
    assert len(framed[3]) == 1


def test_streaming_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    """File-source stream over parquet drops == the batch aggregation
    (same transform, Structured Streaming execution)."""
    events = load_events(spark, sf_dir)
    batch = windowed_event_counts(events, window="1 hour").collect()

    drop_dir = tmp_path / "drops"
    events.repartition(3).write.parquet(str(drop_dir))

    stream = read_events_stream(spark, str(drop_dir), max_files_per_trigger=2)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    got = spark.sql("SELECT * FROM ev_counts").collect()

    def key(rows):
        return sorted(
            (r.window_start, r.event_type, r.n_events, round(r.sum_value, 6))
            for r in rows
        )

    assert key(got) == key(batch)


def test_audio_meta_wav_header(spark):
    import struct as _struct

    from polars_text_spark.operators.multimodal import audio_meta

    def wav(n_ch=2, rate=16000, bits=16, frames=16000):
        block = n_ch * bits // 8
        data_size = frames * block
        fmt = _struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
        body = (b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                + b"data" + _struct.pack("<I", data_size) + b"\x00" * 64)
        return b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    rows = [(1, wav()), (2, wav(n_ch=1, rate=8000, frames=4000)),
            (3, b"\xffnot audio"), (4, None)]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r.media_id: r.m for r in df.select("media_id", audio_meta("media").alias("m")).collect()}
    assert got[1]["format"] == "wav"
    assert (got[1]["n_channels"], got[1]["sample_rate"], got[1]["bits_per_sample"]) == (2, 16000, 16)
    assert got[1]["n_frames"] == 16000
    assert got[1]["duration_s"] == 1.0
    assert got[2]["duration_s"] == 0.5
    assert got[3]["format"] is None and got[3]["n_bytes"] == 10
    assert got[4]["sha256"] is None


def test_image_meta_gif_and_bmp(spark):
    import struct as _struct

    from polars_text_spark.operators.multimodal import image_meta

    gif = b"GIF89a" + _struct.pack("<HH", 320, 200) + b"\x00" * 8
    bmp = (b"BM" + b"\x00" * 12 + _struct.pack("<I", 40)
           + _struct.pack("<ii", 640, -480) + b"\x00" * 8)
    df = spark.createDataFrame(
        [(1, gif), (2, bmp)], "media_id long, media binary"
    )
    got = {r.media_id: r.m for r in df.select("media_id", image_meta("media").alias("m")).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("gif", 320, 200)
    # negative BMP height = top-down bitmap; report magnitude
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("bmp", 640, 480)


def test_bmp_core_header_and_streaming_wav_guards(spark):
    import struct as _struct

    from polars_text_spark.operators.multimodal import audio_meta, image_meta

    # OS/2 BITMAPCOREHEADER: DIB size 12, uint16 dims
    core = (b"BM" + b"\x00" * 12 + _struct.pack("<I", 12)
            + _struct.pack("<HH", 100, 100) + b"\x00" * 8)
    df = spark.createDataFrame([(1, core)], "media_id long, media binary")
    m = df.select(image_meta("media").alias("m")).collect()[0]["m"]
    assert (m["format"], m["width"], m["height"]) == ("bmp", 100, 100)

    # streaming WAV (data size 0xFFFFFFFF): frames/duration stay null
    fmt = _struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    body = (b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", 0xFFFFFFFF))
    wav = b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    # truncated fmt chunk (size 8): fields stay null, no misparse
    bad_fmt = (b"fmt " + _struct.pack("<I", 8) + b"\x00" * 8
               + b"data" + _struct.pack("<I", 64))
    wav_bad = b"RIFF" + _struct.pack("<I", 4 + len(bad_fmt)) + b"WAVE" + bad_fmt
    df2 = spark.createDataFrame([(1, wav), (2, wav_bad)], "media_id long, media binary")
    got = {r.media_id: r.m for r in df2.select("media_id", audio_meta("media").alias("m")).collect()}
    assert got[1]["format"] == "wav" and got[1]["sample_rate"] == 16000
    assert got[1]["n_frames"] is None and got[1]["duration_s"] is None
    assert got[2]["format"] == "wav" and got[2]["n_channels"] is None


# ---------------------------------------------------------------------------
# video_meta: MP4/ISO-BMFF box walk + Ogg page scan (round 8), hand-built
# payloads like the WAV/PNG fixtures above.
# ---------------------------------------------------------------------------


def _box(box_type: bytes, payload: bytes) -> bytes:
    import struct as _struct

    return _struct.pack(">I", 8 + len(payload)) + box_type + payload


def _mp4(version=0, timescale=1000, duration=90_000, tracks=(0, 0)):
    """Minimal ftyp+moov file; tracks is a tuple of (width, height)
    pairs or 0 for an audio (zero-dim) track."""
    import struct as _struct

    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 4 + b"isomiso2")
    if version == 1:
        mvhd = _box(
            b"mvhd",
            b"\x01\x00\x00\x00" + b"\x00" * 16
            + _struct.pack(">IQ", timescale, duration) + b"\x00" * 80,
        )
    else:
        mvhd = _box(
            b"mvhd",
            b"\x00" * 4 + b"\x00" * 8
            + _struct.pack(">II", timescale, duration) + b"\x00" * 80,
        )
    traks = b""
    for t in tracks:
        w, h = t if t else (0, 0)
        tkhd_payload = b"\x00" * 76 + _struct.pack(">II", w << 16, h << 16)
        traks += _box(b"trak", _box(b"tkhd", tkhd_payload))
    return ftyp + _box(b"moov", mvhd + traks)


def _ogg_page(payload: bytes, *, bos=False, granule=0):
    import struct as _struct

    header = (
        b"OggS" + b"\x00" + (b"\x02" if bos else b"\x00")
        + _struct.pack("<q", granule) + b"\x00" * 12
        + bytes([1, min(len(payload), 255)])
    )
    return header + payload


def test_video_meta_mp4_box_walk(spark):
    from polars_text_spark.operators.multimodal import video_meta

    rows = [
        (1, _mp4(version=0, timescale=1000, duration=90_000,
                 tracks=((640, 360), 0))),
        (2, _mp4(version=1, timescale=600, duration=1200, tracks=(0,))),
        (3, b"\x00" * 40),  # unrecognized container
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id int, media binary")
    got = {
        r.media_id: r.v.asDict()
        for r in df.select("media_id", video_meta("media").alias("v")).collect()
    }
    assert got[1]["format"] == "mp4" and got[1]["codec"] == "isom"
    assert (got[1]["width"], got[1]["height"]) == (640, 360)
    assert got[1]["n_tracks"] == 2
    assert abs(got[1]["duration_s"] - 90.0) < 1e-9
    # v1 mvhd (64-bit duration), audio-only: no dims
    assert got[2]["format"] == "mp4" and got[2]["n_tracks"] == 1
    assert abs(got[2]["duration_s"] - 2.0) < 1e-9
    assert got[2]["width"] is None and got[2]["height"] is None
    # unrecognized: bytes-level fields only
    assert got[3]["format"] is None and got[3]["n_bytes"] == 40
    assert got[3]["sha256"] is not None
    assert got[4]["format"] is None and got[4]["n_bytes"] is None


def test_video_meta_ogg_streams(spark):
    import struct as _struct

    from polars_text_spark.operators.multimodal import video_meta

    vorbis_id = b"\x01vorbis" + b"\x00\x00\x00\x00" + bytes([2]) \
        + _struct.pack("<I", 44_100) + b"\x00" * 16
    vorbis = (
        _ogg_page(vorbis_id, bos=True)
        + _ogg_page(b"\x05" * 32, granule=441_000)
    )
    theora_id = (
        b"\x80theora" + bytes([3, 2, 1])
        + _struct.pack(">HH", 40, 30)
        + (640).to_bytes(3, "big") + (480).to_bytes(3, "big")
        + b"\x00" * 10
    )
    theora = _ogg_page(theora_id, bos=True) + _ogg_page(b"x" * 16, bos=True)
    opus = (
        _ogg_page(b"OpusHead" + bytes([1, 2]) + b"\x00" * 8, bos=True)
        + _ogg_page(b"\x05" * 8, granule=96_000)
    )
    rows = [(1, vorbis), (2, theora), (3, opus)]
    df = spark.createDataFrame(rows, "media_id int, media binary")
    got = {
        r.media_id: r.v.asDict()
        for r in df.select("media_id", video_meta("media").alias("v")).collect()
    }
    assert got[1]["format"] == "ogg" and got[1]["codec"] == "vorbis"
    assert got[1]["n_tracks"] == 1
    assert abs(got[1]["duration_s"] - 10.0) < 1e-9  # 441000 / 44100
    assert got[2]["codec"] == "theora"
    assert (got[2]["width"], got[2]["height"]) == (640, 480)
    assert got[2]["n_tracks"] == 2  # second BOS page = second stream
    assert got[2]["duration_s"] is None  # theora granule shift unknown
    assert got[3]["codec"] == "opus"
    assert abs(got[3]["duration_s"] - 2.0) < 1e-9  # 96000 / 48000
