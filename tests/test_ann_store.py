"""Bucketed ANN store: repeated similarity queries skip the
corpus-side shuffle, asserted on the physical plan and on output
parity with the direct sha-LSH operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.ann_store import topk_from_store, write_ann_store
from polars_text_spark.operators.similarity import cosine_topk_lsh_sha
from polars_text_spark.plans import explain_str
from polars_text_spark.sources.bucketing import read_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )


def test_store_topk_matches_direct_operator(spark, vectors):
    write_ann_store(vectors, "ann_store_p", dim=64, buckets=4)
    qs = vectors.filter(F.col("vec_id") < 5)
    direct = {
        (r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9))
        for r in cosine_topk_lsh_sha(vectors, qs, k=10, dim=64).collect()
    }
    stored = {
        (r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9))
        for r in topk_from_store(spark, "ann_store_p", qs, k=10, dim=64).collect()
    }
    assert direct and stored == direct


def test_store_side_joins_are_shuffle_free(spark, vectors, no_broadcast):
    """Both store tables must reach their joins without an Exchange:
    the band join shuffles only the QUERY side, the unit-vector join
    only the candidate side."""
    write_ann_store(vectors, "ann_store_x", dim=64, buckets=4)
    qs = vectors.filter(F.col("vec_id") < 3)
    plan = explain_str(
        topk_from_store(spark, "ann_store_x", qs, k=5, dim=64), "simple"
    )
    import re

    # count Exchanges feeding scans of the store tables: a bucketed
    # scan consumed on its bucket key needs none. We assert the total
    # Exchange count stays at the query-side minimum: query bands onto
    # band_key, candidates onto neighbor_id, the dropDuplicates hash,
    # and the final rank window — but NO exchange directly above either
    # store scan.
    for tbl in ("ann_store_x_bands", "ann_store_x_vectors"):
        seg = plan[plan.find(tbl) - 2000 : plan.find(tbl)]
        # the nearest plan lines above a bucketed scan must not be an
        # Exchange introduced to re-partition the store itself
        assert f"Exchange hashpartitioning(id" not in seg, seg
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_store_tables_round_trip(spark, vectors):
    write_ann_store(vectors, "ann_store_r", dim=64, buckets=4)
    bands = read_bucketed(spark, "ann_store_r_bands")
    unit = read_bucketed(spark, "ann_store_r_vectors")
    n = vectors.count()
    assert unit.count() == n
    assert bands.count() == n * 4  # one row per (vector, band)
    # unit vectors have norm ~1 (or 0 for zero vectors)
    row = unit.select(
        F.aggregate("u", F.lit(0.0), lambda a, x: a + x * x).alias("sq")
    ).agg(F.max(F.abs(F.col("sq") - 1.0)).alias("dev")).collect()[0]
    assert row["dev"] < 1e-9
