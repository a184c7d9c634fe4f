"""Content-addressed result caches for expensive text UDFs.

Re-designs the reference's DuckDB caches (/root/reference/src/cache.rs,
src/expressions.rs:235-245, src/topic_modeling/embedding_cache.rs) for
Spark's execution model. The reference does per-row point lookups under
a file lock; that shape doesn't distribute. The idiomatic Spark shape
(SURVEY.md §2.1 cache table) is join-based:

1. hash every text with the built-in ``sha2(text, 256)``
   (≙ src/cache.rs:23-27's SHA-256 content hash);
2. left-join the input against the cache table (parquet, partitioned
   by ``model``+``params_hash`` scope so scans prune);
3. compute ONLY the distinct missing hashes — ``dropDuplicates`` on the
   hash is the reference's order-preserving miss dedup
   (src/cache.rs:109-124): identical texts are computed once;
4. append new rows to the cache (parquet append tolerates concurrent
   writers the way the reference's ``INSERT OR IGNORE`` tolerates
   duplicate hashes — dupes cost space, not correctness, and the join
   dedups on read);
5. return hits ∪ fresh, joined back on the content hash.

Cache parity contract (tests/test_tokenize_cache.py:22-34 in the
reference): cached output == uncached output, and a warm second run
recomputes nothing.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_text_spark.functions.embedding import embedding
from polars_text_spark.functions.tokenize import TOKEN_SCHEMA, tokenize

__all__ = [
    "cache_table",
    "cached_compute",
    "debug_cache_snapshot",
    "embedding_cached",
    "params_hash",
    "tokenize_cached",
]

_HASH_COL = "content_hash"


def params_hash(params: dict) -> str:
    """sha256 of the canonical-JSON param dict — same scoping idea as
    the reference's ``params_hash`` (src/expressions.rs:461-467)."""
    return hashlib.sha256(
        json.dumps(params, sort_keys=True).encode("utf-8")
    ).hexdigest()


def _scope_dir(cache_path: str, model: str, phash: str) -> str:
    # One directory per (model, params) scope — the PK prefix of the
    # reference's cache table becomes a partition path, so a scoped
    # read never scans other scopes.
    safe_model = model.replace("/", "_").replace(":", "_")
    return os.path.join(cache_path, f"model={safe_model}", f"params={phash}")


def cache_table(spark, cache_path: str, model: str, phash: str, value_type):
    """The scoped cache as a DataFrame[content_hash, value]; empty if
    the scope has never been written."""
    path = _scope_dir(cache_path, model, phash)
    try:
        return spark.read.parquet(path).select(_HASH_COL, "value")
    except Exception:
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField(_HASH_COL, T.StringType(), False),
                T.StructField("value", value_type, True),
            ]
        )
        return spark.createDataFrame([], schema)


def cached_compute(
    df: DataFrame,
    text_col: str,
    value_expr: Column,
    *,
    cache_path: str,
    model: str,
    params: dict,
    value_type,
    output_col: str,
) -> DataFrame:
    """Join-based get-or-compute over a content-addressed cache.

    ``value_expr`` must be a deterministic expression over ``text_col``
    (a tokenize/embedding UDF column). Returns ``df`` + ``output_col``.
    """
    spark = df.sparkSession
    phash = params_hash(params)
    scope = _scope_dir(cache_path, model, phash)

    # Null texts never enter the cache: their result is the operator's
    # fixed null-input value (empty list/vector), restored via coalesce
    # at the end — preserving the reference's null semantics
    # (src/expressions.rs:834-840,663-687) without a cache row.
    hashed = df.withColumn(_HASH_COL, F.sha2(F.col(text_col), 256))
    cached = cache_table(spark, cache_path, model, phash, value_type)

    # Distinct texts only — miss dedup before the expensive UDF
    # (src/cache.rs:109-124). The cache is small relative to the corpus
    # in the steady state; let AQE pick broadcast when it fits.
    distinct_texts = (
        hashed.filter(F.col(text_col).isNotNull())
        .select(_HASH_COL, text_col)
        .dropDuplicates([_HASH_COL])
    )
    misses = distinct_texts.join(cached, _HASH_COL, "left_anti")
    # Single pass: append whatever is missing (an empty write is a
    # no-op), then re-read so the lookup sees hits ∪ fresh from disk —
    # one source of truth, and it validates the parquet round-trip.
    misses.select(_HASH_COL, value_expr.alias("value")).write.mode("append").parquet(
        scope
    )
    cached = cache_table(spark, cache_path, model, phash, value_type)

    null_value = F.array().cast(value_type)
    return (
        hashed.join(
            cached.dropDuplicates([_HASH_COL]).withColumnRenamed("value", output_col),
            _HASH_COL,
            "left",
        )
        .withColumn(
            output_col,
            F.when(F.col(text_col).isNull(), null_value).otherwise(F.col(output_col)),
        )
        .drop(_HASH_COL)
    )


def debug_cache_snapshot(spark, cache_path: str) -> DataFrame:
    """Dump every scope of a cache dir (schema + rows) — the debugging
    aid ≙ the reference's ``debug_token_cache_snapshot``
    (src/lib.rs:127-151). Partition columns (model, params) surface as
    regular columns via partition discovery."""
    return spark.read.option("basePath", cache_path).parquet(
        f"{cache_path}/model=*/params=*"
    )


def tokenize_cached(
    df: DataFrame,
    text_col: str = "text",
    *,
    model: str,
    lowercase: bool = True,
    remove_punct: bool = True,
    cache_path: str,
    output_col: str = "tokens",
) -> DataFrame:
    """Cache-backed tokenize (≙ tokenize(..., cache=path) in the
    reference, src/expressions.rs:761-811)."""
    return cached_compute(
        df,
        text_col,
        tokenize(text_col, model=model, lowercase=lowercase, remove_punct=remove_punct),
        cache_path=cache_path,
        model=model,
        params={"lowercase": lowercase, "remove_punct": remove_punct},
        value_type=TOKEN_SCHEMA,
        output_col=output_col,
    )


def embedding_cached(
    df: DataFrame,
    text_col: str = "text",
    *,
    embedder_model: str,
    batch_size: int | None = None,
    cache_path: str,
    output_col: str = "embedding",
) -> DataFrame:
    """Cache-backed embeddings, scoped by (model, revision, provider)
    like the reference's embedding cache (embedding_cache.rs:35-40);
    revision/provider collapse to 'main'/'spark' here."""
    from polars_text_spark.functions.embedding import VECTOR_TYPE

    return cached_compute(
        df,
        text_col,
        embedding(text_col, embedder_model=embedder_model, batch_size=batch_size),
        cache_path=cache_path,
        model=embedder_model,
        params={"revision": "main", "provider": "spark"},
        value_type=VECTOR_TYPE,
        output_col=output_col,
    )
