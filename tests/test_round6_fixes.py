"""Round-6 additions: sha-portable embedding variant, deterministic
topic-stage oracles, foot-gun guards, and ADVICE fixes."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# native:feature-hash-sha — the oracle-portable embedder variant
# ---------------------------------------------------------------------------


def test_feature_hash_sha_matches_manual_recompute():
    from polars_text_spark.functions.embedding import load_embedder
    from polars_text_spark.functions.tokenize import plain_word_records

    emb = load_embedder("native:feature-hash-sha:64")
    text = "The quick brown fox jumps over the lazy dog. The dog sleeps!"
    vec = emb.embed_batch([text])[0]
    assert vec.dtype == np.float32 and vec.shape == (64,)

    acc = np.zeros(64, dtype=np.float64)
    for tok, _, _ in plain_word_records(text.lower(), True):
        h = int(hashlib.sha256(tok.encode()).hexdigest()[:15], 16)
        acc[h % 64] += 1.0 if (h >> 59) & 1 else -1.0
    norm = math.sqrt(float(np.dot(acc, acc)))
    expected = (acc / norm).astype(np.float32)
    assert np.array_equal(vec, expected)
    assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-6


def test_feature_hash_model_id_parsing():
    from polars_text_spark.functions.embedding import _build_embedder

    assert _build_embedder("native:feature-hash").token_hash == "md5"
    assert _build_embedder("native:feature-hash:32").dim == 32
    sha = _build_embedder("native:feature-hash-sha")
    assert sha.token_hash == "sha" and sha.dim == 64
    sha16 = _build_embedder("native:feature-hash-sha:16")
    assert sha16.token_hash == "sha" and sha16.dim == 16
    with pytest.raises(ValueError, match="feature-hash"):
        _build_embedder("native:feature-hashXX")


def test_feature_hash_sha_differs_from_md5_but_same_shape():
    from polars_text_spark.functions.embedding import load_embedder

    a = load_embedder("native:feature-hash:64").embed_batch(["hello world"])
    b = load_embedder("native:feature-hash-sha:64").embed_batch(["hello world"])
    assert a.shape == b.shape
    assert not np.array_equal(a[0], b[0])
