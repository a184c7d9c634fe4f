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
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ev_counts").collect()

    def key(rows):
        return sorted(
            (r.window_start, r.event_type, r.n_events, round(r.sum_value, 6))
            for r in rows
        )

    assert key(got) == key(batch)
