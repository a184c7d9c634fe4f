"""Perceptual-hash (dHash) tests: pure-Python reimplementation of the
stub byte-grid spec, pair blocking guarantees, gated Pillow parity."""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.phash import (
    chunk_hamming_pairs,
    dhash_chunks,
    dhash_pairs,
    stub_pixels,
    with_dhash,
)
from polars_text_spark.plans.explain import explain_str


def _py_pixels(data: bytes) -> list[int] | None:
    if not data:
        return None
    n = len(data)
    return [data[(i * n) // 72] for i in range(72)]


def _py_chunks(px: list[int] | None) -> list[int] | None:
    if px is None:
        return None
    bits = [
        1 if px[r * 9 + c] > px[r * 9 + c + 1] else 0
        for r in range(8)
        for c in range(8)
    ]
    out = []
    for k in range(4):
        acc = 0
        for x in bits[k * 16 : k * 16 + 16]:
            acc = acc * 2 + x
        out.append(acc)
    return out


PAYLOADS = [
    b"hello world, this is a longer payload with some structure " * 3,
    b"hello world, this is a longer payload with some structure " * 3,  # dup
    bytes(range(256)),
    b"x",          # shorter than the grid: offsets repeat
    b"",           # empty -> NULL signature
    None,          # NULL -> NULL signature
    b"\x00" * 100,  # constant bytes -> all-zero bits
]


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, p) for i, p in enumerate(PAYLOADS)]
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_stub_pixels_and_chunks_match_python(spark, media):
    got = (
        media.select(
            "doc_id",
            stub_pixels(F.col("media")).alias("px"),
            dhash_chunks(stub_pixels(F.col("media"))).alias("sig"),
        )
        .orderBy("doc_id")
        .collect()
    )
    for row in got:
        data = PAYLOADS[row["doc_id"]]
        exp_px = _py_pixels(data) if data is not None else None
        assert row["px"] == exp_px
        assert row["sig"] == _py_chunks(exp_px)
        if row["sig"] is not None:
            assert all(0 <= c <= 0xFFFF for c in row["sig"])


def test_exact_dups_pair_at_hamming_zero(spark, media):
    pairs = dhash_pairs(media, "media", "doc_id", max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs} >= {(0, 1, 0)}
    # NULL-signature rows (4, 5) never appear
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert 4 not in ids and 5 not in ids


def test_near_dup_within_three_bits_is_found(spark):
    # flip the tail byte of a 60-byte payload: only grid samples
    # mapping to the last byte change, so hamming is small
    base = bytes(range(60))
    variant = base[:-1] + b"\xff"
    exp = sum(
        a != b
        for a, b in zip(
            "".join(f"{x:016b}" for x in _py_chunks(_py_pixels(base))),
            "".join(f"{x:016b}" for x in _py_chunks(_py_pixels(variant))),
        )
    )
    df = spark.createDataFrame(
        [(1, base), (2, variant)], "doc_id long, media binary"
    )
    pairs = dhash_pairs(df, "media", "doc_id", max_hamming=3).collect()
    if exp <= 3:
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [
            (1, 2, exp)
        ]
    else:
        assert pairs == []


def test_blocking_never_misses_within_distance(spark):
    # exhaustive adversarial check: flip every single bit of a chunk
    # value directly — distance-1 pairs MUST survive the banding
    sig = [1, 2, 3, 4]
    rows = [(0, sig)]
    rid = 1
    for k in range(4):
        for bit in range(16):
            flipped = list(sig)
            flipped[k] ^= 1 << bit
            rows.append((rid, flipped))
            rid += 1
    df = spark.createDataFrame(rows, "doc_id long, sig array<int>")
    pairs = chunk_hamming_pairs(df, "sig", "doc_id", max_hamming=1)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(0, r) for r in range(1, rid)} <= found


def test_max_hamming_validation(spark, media):
    with pytest.raises(ValueError, match="max_hamming"):
        dhash_pairs(media, "media", "doc_id", max_hamming=4)
    with pytest.raises(ValueError, match="backend"):
        with_dhash(media, "media", backend="opencv")


def test_stub_path_is_udf_free_and_banded(spark, media):
    plan = explain_str(dhash_pairs(media, "media", "doc_id"), "formatted")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None, reason="Pillow not installed"
)
def test_pillow_backend_parity_on_real_image(spark):
    # a tiny synthetic PNG via Pillow itself; the real path must pair
    # a re-encode of the SAME pixels at hamming 0 — the invariance the
    # stub cannot give
    import io

    from PIL import Image

    img = Image.new("L", (32, 32))
    img.putdata([(x * 7 + y * 5) % 256 for y in range(32) for x in range(32)])
    b1, b2 = io.BytesIO(), io.BytesIO()
    img.save(b1, format="PNG")
    img.save(b2, format="BMP")  # different bytes, same pixels
    df = spark.createDataFrame(
        [(1, b1.getvalue()), (2, b2.getvalue())], "doc_id long, media binary"
    )
    pairs = dhash_pairs(df, "media", "doc_id", backend="pillow").collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_pillow_backend_gate_fails_loudly_when_absent(spark, media):
    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("Pillow installed; gate cannot fire")
    with pytest.raises(RuntimeError, match="Pillow"):
        with_dhash(media, "media", backend="pillow")
