"""Cache-layer tests — parity/warm-reuse/miss-dedup contracts from the
reference's tests/test_tokenize_cache.py and FIXTURES.md F5."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from polars_text_spark.functions import tokenize
from polars_text_spark.operators.cache import embedding_cached, tokenize_cached

MODEL = "native:plain_words_en"


def _tokens_by_id(df):
    return {
        r.id: [t.token for t in r.tokens]
        for r in df.select("id", "tokens").collect()
    }


def test_cached_equals_uncached(spark, tmp_path):
    rows = [(1, "alpha beta"), (2, "Gamma, delta!"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, ["id", "text"])
    plain = df.select("id", tokenize("text", model=MODEL))
    cached = tokenize_cached(df, "text", model=MODEL, cache_path=str(tmp_path / "c"))
    assert _tokens_by_id(plain) == _tokens_by_id(cached)
    # null/empty stay empty lists, never null
    got = _tokens_by_id(cached)
    assert got[3] == [] and got[4] == []


def test_warm_cache_reuse_and_stability(spark, tmp_path):
    rows = [(i, f"text number {i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "text"])
    path = str(tmp_path / "c")
    first = _tokens_by_id(tokenize_cached(df, "text", model=MODEL, cache_path=path))
    files_after_first = set(glob.glob(f"{path}/**/*.parquet", recursive=True))
    second = _tokens_by_id(tokenize_cached(df, "text", model=MODEL, cache_path=path))
    files_after_second = set(glob.glob(f"{path}/**/*.parquet", recursive=True))
    assert first == second
    # warm run appends nothing but empty markers: no new data rows
    new_files = files_after_second - files_after_first
    if new_files:
        import pyarrow.parquet as pq

        assert sum(pq.read_metadata(f).num_rows for f in new_files) == 0


def test_miss_dedup_identical_texts(spark, tmp_path):
    """Identical texts are computed/stored once (src/cache.rs:109-124)."""
    df = spark.createDataFrame([(i, "same") for i in range(5)], ["id", "text"])
    path = str(tmp_path / "c")
    out = tokenize_cached(df, "text", model=MODEL, cache_path=path)
    assert all(v == ["same"] for v in _tokens_by_id(out).values())
    cache_rows = spark.read.parquet(f"{path}/model=native_plain_words_en/*").count()
    assert cache_rows == 1


def test_param_scopes_are_isolated(spark, tmp_path):
    df = spark.createDataFrame([(1, "Hello, world!")], ["id", "text"])
    path = str(tmp_path / "c")
    keep = tokenize_cached(
        df, "text", model=MODEL, remove_punct=False, cache_path=path
    )
    drop = tokenize_cached(df, "text", model=MODEL, remove_punct=True, cache_path=path)
    assert _tokens_by_id(keep)[1] == ["hello", ",", "world", "!"]
    assert _tokens_by_id(drop)[1] == ["hello", "world"]


def test_embedding_cache_parity(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, None), (3, "the quick fox")], ["id", "text"]
    )
    out = embedding_cached(
        df,
        "text",
        embedder_model="native:feature-hash:16",
        cache_path=str(tmp_path / "e"),
    )
    rows = {r.id: list(r.embedding) for r in out.select("id", "embedding").collect()}
    assert rows[1] == rows[3] and len(rows[1]) == 16
    assert rows[2] == []  # null -> empty vector
