"""Independent correctness twins for the rows-only approximate ops
(round-2 verdict item #6): a pure-Python SimHash twin — including a
from-scratch XXH64 so the Spark bit-mix is checked against an
INDEPENDENT implementation, not itself — and recall@k floors for the
LSH/IVF ANN driver queries against the exact brute-force query at
sf0.01. A broken hash mix, band key, or probe path can no longer ship
behind a rows-only driver check.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

# ---- pure-Python XXH64 (reference implementation of the algorithm
# spec; validated against Spark's xxhash64 below) ---------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 over ``data``; returns a SIGNED 64-bit int to match
    Spark's ``xxhash64`` (default seed 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v = [
            (seed + _P1 + _P2) & _M,
            (seed + _P2) & _M,
            seed & _M,
            (seed - _P1) & _M,
        ]
        while i <= n - 32:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v[j] = (_rotl((v[j] + lane * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & _M
        for vj in v:
            h = (((h ^ ((_rotl((vj * _P2) & _M, 31) * _P1) & _M)) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ ((k * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def py_simhash(text: str, bits: int = 64) -> int:
    """Twin of ``dedup.simhash``: whitespace tokens of the trimmed
    lowercased text, per-bit signed majority vote over token XXH64s,
    sign bit (63) left clear."""
    tokens = re.split(r"\s+", text.strip().lower())
    votes = [0] * (bits - 1)
    for t in tokens:
        h = xxh64(t.encode("utf-8"))
        for i in range(bits - 1):
            votes[i] += 1 if h & (1 << i) else -1
    return sum(1 << i for i in range(bits - 1) if votes[i] > 0)


def test_xxh64_matches_spark(spark):
    """The from-scratch XXH64 reproduces Spark's xxhash64 bit-for-bit
    across size classes (empty / <4 / <8 / <32 / >=32 bytes / UTF-8)."""
    cases = ["", "a", "abc", "hello", "hello world", "x" * 31, "y" * 32, "z" * 100, "日本語テキスト"]
    df = spark.createDataFrame([(t,) for t in cases], ["t"])
    got = {r["t"]: r["h"] for r in df.select("t", F.xxhash64("t").alias("h")).collect()}
    for t in cases:
        assert xxh64(t.encode("utf-8")) == got[t], t


@pytest.fixture(scope="module")
def simhash_corpus():
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    variant = base.replace("today", "tonight")
    return [
        (0, base),
        (1, base),  # exact dup -> hamming 0, guaranteed pair
        (2, variant),  # one-token edit -> small hamming
        (3, " ".join(reversed(base.split()))),  # same token multiset
        (4, "completely different content about spark partition shuffles"),
        (5, "yet another unrelated document mentioning catalyst plans"),
        (6, "financial report quarterly revenue increased seven percent"),
        (7, base + " extra trailing tokens appended here"),
    ]


def test_simhash_values_match_python_twin(spark, simhash_corpus):
    """Per-document SimHash VALUES equal the twin's — a wrong mask
    array, vote fold, or bit threshold cannot survive this."""
    from polars_text_spark.operators.dedup import simhash

    df = spark.createDataFrame(simhash_corpus, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", simhash("text").alias("sh")).collect()
    }
    for doc_id, text in simhash_corpus:
        expected = py_simhash(text)
        assert got[doc_id] == expected, f"doc {doc_id}"
        assert expected >= 0  # sign bit clear by construction
    # token-order invariance: same multiset -> same hash
    assert got[0] == got[3]


def test_simhash_pairs_match_python_all_pairs(spark, simhash_corpus):
    """simhash_pairs (pigeonhole-blocked equi-join) returns EXACTLY the
    pairs a brute-force all-pairs Hamming scan of the twin finds."""
    from polars_text_spark.operators.dedup import simhash_pairs

    max_hamming = 3
    hashes = {i: py_simhash(t) for i, t in simhash_corpus}
    expected = set()
    ids = sorted(hashes)
    for a in ids:
        for b in ids:
            if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= max_hamming:
                expected.add((a, b))
    assert expected, "fixture must contain at least one near-dup pair"

    df = spark.createDataFrame(simhash_corpus, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(df, max_hamming=max_hamming).collect()
    }
    assert set(got) == expected
    for (a, b), ham in got.items():
        assert ham == bin(hashes[a] ^ hashes[b]).count("1")


# ---- ANN recall floors at sf0.01 (driver-visible queries) -----------------

_SF001 = "/root/testdata/sf0.01"


def _topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


@pytest.fixture(scope="module")
def exact_topk(spark):
    from polars_text_spark import queries as Q

    return _topk_sets(Q.QUERIES["similarity_topk"](spark, _SF001))


def test_lsh_recall_floor_at_sf001(spark, exact_topk):
    """recall@10 of the LSH driver query vs exact brute force: measured
    ~0.40 mean at these parameters (16 planes / 4 bands); the floor
    catches a broken bit-mix or band key (random recall here is <2%)."""
    from polars_text_spark import queries as Q

    approx = _topk_sets(Q.QUERIES["similarity_topk_lsh"](spark, _SF001))
    recalls = [
        len(approx.get(q, set()) & nb) / len(nb) for q, nb in exact_topk.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.2
    assert min(recalls) >= 0.1


def test_ivf_recall_floor_at_sf001(spark, exact_topk):
    """recall@10 of the IVF driver query vs exact brute force: measured
    ~0.52 mean at nprobe=4; the floor catches a mistrained codebook or
    a broken probe path."""
    from polars_text_spark import queries as Q

    approx = _topk_sets(Q.QUERIES["similarity_topk_ivf"](spark, _SF001))
    recalls = [
        len(approx.get(q, set()) & nb) / len(nb) for q, nb in exact_topk.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.3
    assert min(recalls) >= 0.15
