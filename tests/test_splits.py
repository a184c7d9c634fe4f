"""Deterministic splitting / leakage audit / sharding
(operators/splits.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.splits import (
    assign_splits,
    shard_assignment,
    split_leakage,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_assign_splits_is_content_keyed_and_partitioned(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = assign_splits(
        docs, "doc_id", {"val": 0.1, "test": 0.1, "train": 0.8}
    )
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    # exact reimplementation driver-side: split depends only on the key
    for doc_id, split in rows.items():
        h8 = hashlib.sha256(str(doc_id).encode()).hexdigest()[:8]
        if h8 < format(int(0.1 * 16**8), "08x"):
            expect = "val"
        elif h8 < format(int(0.2 * 16**8), "08x"):
            expect = "test"
        else:
            expect = "train"
        assert split == expect
    # roughly the requested proportions
    n = len(rows)
    n_train = sum(1 for s in rows.values() if s == "train")
    assert 0.7 * n <= n_train <= 0.9 * n
    # repartitioning cannot change assignments
    again = assign_splits(
        docs.repartition(7), "doc_id",
        {"val": 0.1, "test": 0.1, "train": 0.8},
    )
    assert rows == {r["doc_id"]: r["split"] for r in again.collect()}


def test_assign_splits_group_keyed_moves_whole_groups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = assign_splits(
        docs, "doc_id", {"holdout": 0.5, "train": 0.5}, group_col="source"
    )
    per_source = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert per_source and all(r["k"] == 1 for r in per_source)


def test_assign_splits_validation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(docs, "doc_id", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match=">= 2"):
        assign_splits(docs, "doc_id", {"a": 1.0})
    with pytest.raises(ValueError, match="> 0"):
        assign_splits(docs, "doc_id", {"a": 1.2, "b": -0.2})


def test_assign_splits_is_map_only(spark, sf_dir):
    out = assign_splits(
        _docs(spark, sf_dir), "doc_id", {"val": 0.2, "train": 0.8}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_leakage_flags_train_duplicates(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i}") for i in range(8)], "doc_id int, split_raw string"
    ).withColumn(
        "split",
        F.when(F.col("doc_id") < 5, "train").otherwise("val"),
    )
    # duplicate families: {0,5} (train+val -> leak), {6,7} (val only),
    # 1..4 train singletons, nothing else
    pairs = spark.createDataFrame(
        [(0, 5), (6, 7)], "id_a int, id_b int"
    )
    out = split_leakage(docs, pairs, "doc_id", "split")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {5, 6, 7}  # only non-train rows reported
    assert rows[5]["contaminated"] is True and rows[5]["component"] == 0
    assert rows[6]["contaminated"] is False
    assert rows[7]["contaminated"] is False and rows[7]["component"] == 6


def test_shard_assignment_properties(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = shard_assignment(docs, "doc_id", n_shards=4).collect()
    n = len(out)
    assert n == docs.count()
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r)
    # every shard used, roughly balanced, positions contiguous from 0
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rows in by_shard.items():
        sizes = sorted(r["shard_pos"] for r in rows)
        assert sizes == list(range(len(rows)))
        assert len(rows) > n / 16  # no pathological imbalance
    # deterministic under repartition
    again = shard_assignment(docs.repartition(5), "doc_id", n_shards=4)
    a = {(r["doc_id"]): (r["shard"], r["shard_pos"]) for r in out}
    b = {(r["doc_id"]): (r["shard"], r["shard_pos"]) for r in again.collect()}
    assert a == b


def test_shard_assignment_single_shuffle(spark, sf_dir):
    out = shard_assignment(_docs(spark, sf_dir), "doc_id", n_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the window's hashpartitioning on shard
    assert plan.count("Exchange") == 1
