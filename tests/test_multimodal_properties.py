"""Property tests for the bytes-level media parsers — pure Python (no
SparkSession), so hypothesis can hammer them with adversarial bytes.
The invariant that matters operationally: a parser fed arbitrary or
truncated bytes must return a well-typed dict (or None), NEVER raise —
at 100 TB a corrupt payload that throws inside a pandas UDF kills the
stage."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from polars_text_spark.operators.multimodal import (
    AUDIO_META_TYPE,
    IMAGE_META_TYPE,
    VIDEO_META_TYPE,
    _parse_image_header,
    _parse_video_header,
    _parse_wav_header,
)

_PARSERS = [
    (_parse_image_header, IMAGE_META_TYPE),
    (_parse_wav_header, AUDIO_META_TYPE),
    (_parse_video_header, VIDEO_META_TYPE),
]


@given(data=st.binary(max_size=512))
@settings(max_examples=300, deadline=None)
def test_parsers_never_raise_on_arbitrary_bytes(data):
    for parse, schema in _PARSERS:
        meta = parse(data)
        assert set(meta) == {f.name for f in schema.fields}
        assert meta["n_bytes"] == len(data)


@given(data=st.binary(min_size=4, max_size=256))
@settings(max_examples=200, deadline=None)
def test_parsers_never_raise_on_magic_prefixed_garbage(data):
    """Valid magics followed by garbage exercise the deep branches."""
    magics = [
        b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF89a", b"BM",
        b"RIFF", b"OggS\x00",
        # a plausible box header in front of garbage
        len(data).to_bytes(4, "big") + b"ftyp",
        b"\x00\x00\x00\x01ftyp",  # size=1 -> largesize path
        b"\x00\x00\x00\x00ftyp",  # size=0 -> to-end path
    ]
    for magic in magics:
        payload = magic + data
        for parse, schema in _PARSERS:
            meta = parse(payload)
            assert set(meta) == {f.name for f in schema.fields}
            for key in ("width", "height", "n_tracks"):
                if key in meta and meta[key] is not None:
                    assert meta[key] >= 0


def test_parsers_none_passthrough():
    for parse, _ in _PARSERS:
        assert parse(None) is None


@given(
    surfaces=st.lists(st.text(min_size=0, max_size=5), max_size=20),
    joiner=st.sampled_from(["", " ", "  ", "\t"]),
)
@settings(max_examples=300, deadline=None)
def test_sweep_offsets_invariant_holds_for_any_surfaces(surfaces, joiner):
    """For text BUILT from the surfaces, every record must satisfy
    text[start:end] == token with monotone non-overlapping spans."""
    from polars_text_spark.functions.tokenize import _sweep_surface_offsets

    text = joiner.join(surfaces)
    recs = _sweep_surface_offsets(text, surfaces)
    last_end = 0
    for tok, start, end in recs:
        assert text[start:end] == tok
        assert start >= last_end
        last_end = end


def test_ogg_payload_fake_page_not_counted():
    """A payload byte-pattern that looks like an 'OggS' capture pattern
    must not be counted as a page — the walker advances by segment-table
    lacing values, never by byte scanning."""
    import struct as _struct

    from polars_text_spark.operators.multimodal import _parse_video_header

    def page(payload, *, bos=False, granule=0):
        return (
            b"OggS\x00" + (b"\x02" if bos else b"\x00")
            + _struct.pack("<q", granule) + b"\x00" * 12
            + bytes([1, len(payload)]) + payload
        )

    vorbis_id = (
        b"\x01vorbis" + b"\x00" * 4 + bytes([2])
        + _struct.pack("<I", 44_100) + b"\x00" * 16
    )
    evil = page(vorbis_id, bos=True) + page(
        b"OggS" + b"\x02" * 24, granule=441_000
    )
    meta = _parse_video_header(evil)
    assert meta["n_tracks"] == 1  # the embedded fake BOS page is payload
    assert abs(meta["duration_s"] - 10.0) < 1e-9


def test_ogg_muxed_duration_uses_first_stream_serial():
    """In a muxed file, the final page often belongs to the OTHER
    stream (whose granule is in a different unit); duration must come
    from the last granule of the SAME logical stream that supplied the
    rate — matched by page serial number."""
    import struct as _struct

    from polars_text_spark.operators.multimodal import _parse_video_header

    def page(payload, *, serial, bos=False, granule=0):
        return (
            b"OggS\x00" + (b"\x02" if bos else b"\x00")
            + _struct.pack("<q", granule)
            + _struct.pack("<I", serial) + b"\x00" * 8
            + bytes([1, len(payload)]) + payload
        )

    vorbis_id = (
        b"\x01vorbis" + b"\x00" * 4 + bytes([2])
        + _struct.pack("<I", 44_100) + b"\x00" * 16
    )
    theora_id = (
        b"\x80theora" + bytes([3, 2, 1]) + _struct.pack(">HH", 40, 30)
        + (640).to_bytes(3, "big") + (480).to_bytes(3, "big") + b"\x00" * 10
    )
    muxed = (
        page(vorbis_id, serial=7, bos=True)
        + page(theora_id, serial=9, bos=True)
        + page(b"a" * 16, serial=7, granule=441_000)
        # final page: the OTHER stream, huge shifted frame-granule
        + page(b"b" * 16, serial=9, granule=1 << 40)
    )
    meta = _parse_video_header(muxed)
    assert meta["codec"] == "vorbis" and meta["n_tracks"] == 2
    assert abs(meta["duration_s"] - 10.0) < 1e-9  # 441000/44100, not 2^40


# ---- round-9: gated frame-decode backends --------------------------------

# Hand-assembled 2-frame GIF (1x1, 2-color palette): header + two
# image blocks whose single pixel differs (palette index 0 vs 1) —
# the smallest fixture whose two frames decode to DIFFERENT pixels.
TWO_FRAME_GIF = (
    b"GIF89a"
    + b"\x01\x00\x01\x00"  # 1x1 logical screen
    + b"\xf0\x00\x00"      # 2-color global table, bg 0
    + b"\x00\x00\x00\xff\xff\xff"  # palette: black, white
    # frame 1: pixel -> palette 0 (codes clear,0,eoi packed LSB-first)
    + b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"
    + b"\x02\x02\x44\x01\x00"
    # frame 2: pixel -> palette 1
    + b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"
    + b"\x02\x02\x4c\x01\x00"
    + b"\x3b"
)


def test_sample_frames_stub_path_unchanged(spark):
    """The default backend stays the deterministic byte-stride stub —
    the path the driver oracle replays (no dependency, no drift)."""
    import hashlib

    from polars_text_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 300)], "id int, media binary"
    )
    (row,) = sample_frames(
        df, every_n_bytes=1 << 12, max_frames=3
    ).select("frames").collect()
    frames = row.frames
    assert [f.offset for f in frames] == [0, 4096, 8192]
    data = bytes(range(256)) * 300
    for f in frames:
        expect = hashlib.sha256(
            data[f.offset : f.offset + 256]
        ).hexdigest()[:16]
        assert f.digest == expect


def test_sample_frames_unknown_and_missing_backends_fail_loudly(spark):
    import importlib.util

    import pytest as _pytest

    from polars_text_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, b"x")], "id int, media binary")
    with _pytest.raises(ValueError, match="unknown sample_frames backend"):
        sample_frames(df, backend="ffmpeg")
    if importlib.util.find_spec("av") is None:
        with _pytest.raises(RuntimeError, match="PyAV"):
            sample_frames(df, backend="av")
    if importlib.util.find_spec("PIL") is None:
        with _pytest.raises(RuntimeError, match="Pillow"):
            sample_frames(df, backend="pillow")


def test_two_frame_gif_fixture_is_a_valid_gif():
    """Dependency-free sanity on the hand-built fixture: the repo's own
    GIF header parser must read it as a 1x1 GIF (so the gated Pillow
    test below exercises a genuinely well-formed file)."""
    from polars_text_spark.operators.multimodal import _parse_image_header

    meta = _parse_image_header(TWO_FRAME_GIF)
    assert meta["format"] == "gif"
    assert (meta["width"], meta["height"]) == (1, 1)


def test_pillow_backend_decodes_two_distinct_frames(spark):  # pragma: no cover
    """Gated: with Pillow installed, the 2-frame GIF must yield TWO
    frames whose pixel digests DIFFER (black vs white pixel) — real
    decode, which the byte-stride stub cannot produce from a 36-byte
    payload (stride 64KiB -> one stub window)."""
    import importlib.util

    import pytest as _pytest

    if importlib.util.find_spec("PIL") is None:
        _pytest.skip("requires Pillow")
    from polars_text_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, TWO_FRAME_GIF)], "id int, media binary")
    (row,) = sample_frames(df, backend="pillow", max_frames=8).select(
        "frames"
    ).collect()
    assert len(row.frames) == 2
    assert row.frames[0].digest != row.frames[1].digest
    assert [f.frame_index for f in row.frames] == [0, 1]


def test_av_backend_round_trips_keyframes(spark):  # pragma: no cover
    """Gated: with PyAV installed, encode a tiny 2-frame video
    in-memory and extract its keyframes."""
    import importlib.util

    import pytest as _pytest

    if importlib.util.find_spec("av") is None:
        _pytest.skip("requires PyAV")
    import io

    import av
    import numpy as np

    from polars_text_spark.operators.multimodal import sample_frames

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("h264", rate=1)
        stream.width, stream.height = 16, 16
        stream.pix_fmt = "yuv420p"
        stream.options = {"g": "1"}  # every frame a keyframe
        for shade in (0, 255):
            arr = np.full((16, 16, 3), shade, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "id int, media binary"
    )
    (row,) = sample_frames(df, backend="av", max_frames=8).select(
        "frames"
    ).collect()
    assert len(row.frames) == 2
    assert row.frames[0].digest != row.frames[1].digest


# ---------------------------------------------------------------------------
# PCM16 WAV encode/decode round-trip (real decode, no codec library)
# ---------------------------------------------------------------------------


def _wav_bytes(samples, rate=8000, channels=1):
    """Hand-rolled reference WAV writer (stdlib only) — independent of
    the JVM-side synth under test."""
    import struct as st

    data = b"".join(st.pack("<h", s) for s in samples)
    block = 2 * channels
    return (
        b"RIFF"
        + st.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + st.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16)
        + b"data"
        + st.pack("<I", len(data))
        + data
    )


def test_synth_wav_matches_reference_writer(spark):
    """The JVM hex-assembly encoder must produce byte-identical WAV
    files to a stdlib struct.pack writer — including negative-sample
    two's complement and the little-endian header fields."""
    from pyspark.sql import functions as F

    from polars_text_spark.operators.multimodal import synth_wav_pcm16

    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    df = spark.createDataFrame([(samples,)], "s array<int>")
    (row,) = df.select(synth_wav_pcm16(F.col("s"), 8000).alias("w")).collect()
    assert bytes(row.w) == _wav_bytes(samples, 8000)


def test_wav_pcm_stats_roundtrip(spark):
    from pyspark.sql import functions as F

    from polars_text_spark.operators.multimodal import (
        synth_wav_pcm16,
        wav_pcm_stats,
    )

    samples = [100, -200, 32767, -32768, 0, 5000]
    df = spark.createDataFrame([(samples,)], "s array<int>")
    (row,) = (
        df.select(synth_wav_pcm16(F.col("s"), 44100).alias("w"))
        .select(wav_pcm_stats("w").alias("p"))
        .collect()
    )
    import math as m

    assert row.p.n_samples == 6
    assert row.p.sample_rate == 44100
    assert row.p.peak == 32768
    assert row.p.clip_ratio == 2 / 6
    want = m.sqrt(sum(s * s for s in samples) / 6)
    assert abs(row.p.rms - want) < 1e-9


def test_wav_pcm_stats_stereo_counts_interleaved(spark):
    from polars_text_spark.operators.multimodal import wav_pcm_stats

    wav = _wav_bytes([1000, -1000, 2000, -2000], rate=8000, channels=2)
    df = spark.createDataFrame([(wav,)], "w binary")
    (row,) = df.select(wav_pcm_stats("w").alias("p")).collect()
    assert row.p.n_samples == 4  # 2 frames x 2 channels, interleaved
    assert row.p.peak == 2000


def test_wav_pcm_stats_rejects_non_pcm_and_garbage(spark):
    import struct as st

    from polars_text_spark.operators.multimodal import wav_pcm_stats

    # float-format WAV (audio_format=3): real container, not PCM16
    float_wav = (
        b"RIFF" + st.pack("<I", 40) + b"WAVE" + b"fmt "
        + st.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        + b"data" + st.pack("<I", 4) + b"\x00" * 4
    )
    rows = [(1, float_wav), (2, b"not a wav at all"), (3, None)]
    df = spark.createDataFrame(rows, "id int, w binary")
    got = {
        r.id: r.p.n_samples
        for r in df.select("id", wav_pcm_stats("w").alias("p")).collect()
    }
    assert got == {1: None, 2: None, 3: None}


def test_wav_pcm_stats_truncated_payload_clips(spark):
    """A data chunk header promising more bytes than the file holds
    decodes what is actually there (dropping any odd trailing byte)
    instead of erroring — the defensive posture every header parser
    in this module takes against adversarial bytes."""
    from polars_text_spark.operators.multimodal import wav_pcm_stats

    full = _wav_bytes([100, 200, 300], rate=8000)
    truncated = full[:-3]  # loses sample 3 and half of sample 2's bytes
    df = spark.createDataFrame([(truncated,)], "w binary")
    (row,) = df.select(wav_pcm_stats("w").alias("p")).collect()
    assert row.p.n_samples == 1
    assert row.p.peak == 100
