"""Arrow candidate re-rank (VERDICT r11 #7 / r10 task #5): routing the
LSH/IVF re-rank through the Arrow fold scorer must be BIT-identical to
the expression-dot path — same candidates, same cosines (the fold
replays the engine's normalize + left-fold order), same ranks — while
the candidate join carries no vector payload."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.similarity import (
    cosine_topk_ivf,
    cosine_topk_lsh,
    cosine_topk_lsh_sha,
)


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def queries(vectors):
    return vectors.limit(7)


def _rows(df):
    return {
        (r.query_id, r.neighbor_id, r.cosine, r.rank) for r in df.collect()
    }


def test_lsh_arrow_rerank_bit_identical(vectors, queries):
    kw = dict(k=5, dim=64, num_planes=8, bands=4)
    expr = _rows(cosine_topk_lsh(vectors, queries, **kw))
    arrow = _rows(cosine_topk_lsh(vectors, queries, rerank="arrow", **kw))
    assert expr == arrow
    assert expr  # non-vacuous


def test_lsh_sha_arrow_rerank_bit_identical(vectors, queries):
    kw = dict(k=5, dim=64, num_planes=8, bands=4)
    expr = _rows(cosine_topk_lsh_sha(vectors, queries, **kw))
    arrow = _rows(
        cosine_topk_lsh_sha(vectors, queries, rerank="arrow", **kw)
    )
    assert expr == arrow
    assert expr


def test_ivf_arrow_rerank_bit_identical(vectors, queries):
    kw = dict(k=5, n_lists=8, nprobe=3)
    expr = _rows(cosine_topk_ivf(vectors, queries, **kw))
    arrow = _rows(cosine_topk_ivf(vectors, queries, rerank="arrow", **kw))
    assert expr == arrow
    assert expr


def test_arrow_rerank_validates_mode(vectors, queries):
    with pytest.raises(ValueError, match="rerank"):
        cosine_topk_lsh(
            vectors, queries, k=3, dim=64, rerank="bogus"
        ).collect()
    with pytest.raises(ValueError, match="rerank"):
        cosine_topk_ivf(vectors, queries, k=3, rerank="bogus").collect()


def test_arrow_rerank_empty_queries(spark, vectors, queries):
    empty = queries.filter(F.lit(False))
    got = cosine_topk_lsh(
        vectors, empty, k=3, dim=64, rerank="arrow"
    ).collect()
    assert got == []
