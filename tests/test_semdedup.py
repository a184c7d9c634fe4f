"""Unit tests for deterministic k-means and SemDeDup pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.semdedup import (
    kmeans_assign,
    semantic_dup_pairs,
)


def _vecs(spark):
    # two tight groups around (1,0) and (0,1), plus one outlier-ish
    # point nearer group B
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [1.1, -0.1]),
        (10, [0.0, 1.0]),
        (11, [0.1, 0.9]),
        (12, [-0.1, 1.1]),
        (20, [0.3, 0.7]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_obvious_groups(spark):
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(_vecs(spark), k=2, iterations=3).collect()
    }
    # seeds are vec_id 1 and 2 (both group A), but one mean update
    # pulls a centroid to group B
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12] == got[20]
    assert got[1] != got[10]


def test_kmeans_deterministic_across_runs(spark):
    df = _vecs(spark)
    a = sorted(kmeans_assign(df, k=3, iterations=2).collect())
    b = sorted(kmeans_assign(df, k=3, iterations=2).collect())
    assert a == b


def test_kmeans_k_larger_than_n_degrades(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = kmeans_assign(df, k=10, iterations=1).collect()
    assert len(got) == 2
    assert {r["cluster"] for r in got} == {0, 1}


def test_kmeans_null_vectors_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    assert kmeans_assign(df, k=1, iterations=1).count() == 1
    with pytest.raises(ValueError):
        kmeans_assign(df, k=0)
    with pytest.raises(ValueError):
        kmeans_assign(df.filter("vec_id < 0"), k=1)
    clash = df.withColumn("__km_v", F.lit(1))
    with pytest.raises(ValueError):
        kmeans_assign(clash, k=1)


def test_semantic_pairs_only_within_cluster_and_thresholded(spark):
    pairs = semantic_dup_pairs(
        _vecs(spark), k=2, iterations=3, tau=0.95
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs}
    # cos((1,0),(0.9,0.1)) ~ 0.9939 -> in; cross-group pairs are in
    # different clusters and never evaluated
    assert (1, 2) in got
    assert all(a < b for a, b in got)
    assert all(c >= 0.95 for c in got.values())
    for a, b in got:
        assert not ({a, b} <= {1, 2, 3} and {a, b} & {10, 11, 12, 20})


def test_semantic_pairs_zero_vector_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = semantic_dup_pairs(df, k=1, iterations=1, tau=0.5).collect()
    # zero vectors have cosine 0 with everything -> no pairs survive
    assert all({r["id_a"], r["id_b"]} != {1, 2} for r in pairs)
