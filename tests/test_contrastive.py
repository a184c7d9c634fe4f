"""Contrastive-triplet mining (operators/contrastive.py): hand-case
argmax semantics, corpus invariants, margin validation, and the
one-candidate-pass plan claim (AQE exchange reuse)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.contrastive import (
    contrastive_triplets,
    hard_negatives,
)


def test_hard_negatives_argmax_and_tiebreak(spark):
    scored = spark.createDataFrame(
        [
            # anchor 1: 0.19 wins over 0.05; 0.5 is above the ceiling
            (1, 10, 0.5),
            (1, 11, 0.19),
            (1, 12, 0.05),
            # anchor 2: exact tie at 0.1 -> smaller neighbor id wins
            (2, 21, 0.1),
            (2, 20, 0.1),
            # anchor 3: nothing below the ceiling -> no row
            (3, 30, 0.9),
        ],
        "query_id long, neighbor_id long, cosine double",
    )
    rows = {
        r.query_id: r
        for r in hard_negatives(scored, neg_ceiling=0.2).collect()
    }
    assert rows[1].negative_id == 11 and rows[1].neg_cosine == 0.19
    assert rows[2].negative_id == 20
    assert 3 not in rows


def test_hard_negatives_string_ids(spark):
    """id_col is a generic parameter — string ids (doc/URL ids) must
    work. The tie-break negates the cosine, not the id: negating a
    string id would throw CAST_INVALID_INPUT under ANSI."""
    scored = spark.createDataFrame(
        [
            ("q1", "doc-b", 0.15),
            ("q1", "doc-a", 0.15),  # tie -> lexicographically smaller
            ("q1", "doc-c", 0.05),
        ],
        "query_id string, neighbor_id string, cosine double",
    )
    rows = hard_negatives(scored, neg_ceiling=0.2).collect()
    assert len(rows) == 1
    assert rows[0].negative_id == "doc-a"
    assert rows[0].neg_cosine == 0.15


def test_triplets_invariants_on_corpus(spark, sf_dir):
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )
    out = contrastive_triplets(
        vecs, dim=64, pos_threshold=0.35, neg_ceiling=0.2
    ).collect()
    assert len(out) > 0
    pairs = set()
    for r in out:
        # margin contract: positive at/above threshold, negative
        # strictly below the ceiling, never the same vector twice
        assert r.pos_cosine >= 0.35
        assert r.neg_cosine < 0.2
        assert len({r.anchor_id, r.positive_id, r.negative_id}) == 3
        pairs.add((r.anchor_id, r.positive_id))
    # every positive pair appears in both orientations on this corpus
    # (every anchor here has a qualifying negative)
    assert all((p, a) in pairs for a, p in pairs)


def test_triplets_one_candidate_pass(spark, sf_dir):
    """The pos and neg legs must share the banded candidate shuffle:
    after execution, AQE's plan shows ReusedExchange for the self-join
    sides instead of recomputing the candidate generation twice."""
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )
    out = contrastive_triplets(
        vecs, dim=64, pos_threshold=0.35, neg_ceiling=0.2
    )
    out.collect()
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "ReusedExchange" in plan


def test_triplets_margin_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="ambiguity margin"):
        contrastive_triplets(df, dim=1, pos_threshold=0.5, neg_ceiling=0.5)


def test_hard_negatives_ignores_null_neighbor_ids(spark):
    """A null neighbor_id must never win a cosine tie (struct MIN
    sorts nulls first ascending) — null-id candidates are dropped."""
    scored = spark.createDataFrame(
        [("q", None, 0.15), ("q", "doc-a", 0.15)],
        "query_id string, neighbor_id string, cosine double",
    )
    rows = hard_negatives(scored, neg_ceiling=0.2).collect()
    assert len(rows) == 1 and rows[0].negative_id == "doc-a"
