"""Bitext mining (operators/bitext.py): hand-case k-NN mean, corpus
invariants (side purity, 1:1 matching, margin floor, threshold
monotonicity), and candidate-shuffle reuse."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.bitext import bitext_mine, knn_avg_cosine


def test_knn_avg_cosine_exact(spark):
    tk = spark.createDataFrame(
        [(1, 10, 0.5, 1), (1, 11, 0.25, 2), (2, 10, 0.8, 1)],
        "query_id long, neighbor_id long, cosine double, rank int",
    )
    rows = {r.query_id: r.avg_cos for r in knn_avg_cosine(tk).collect()}
    assert rows[1] == (0.25 + 0.5) / 2
    assert rows[2] == 0.8


def _mine(spark, sf_dir, threshold):
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )
    return bitext_mine(
        vecs.filter(F.col("label") % 2 == 0),
        vecs.filter(F.col("label") % 2 == 1),
        dim=64,
        k=4,
        margin_threshold=threshold,
    )


def test_bitext_invariants(spark, sf_dir):
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    side = {
        r.vec_id: r.label % 2 for r in vecs.select("vec_id", "label").collect()
    }
    out = _mine(spark, sf_dir, 1.1).collect()
    assert out  # non-vacuous
    lefts = [r.left_id for r in out]
    rights = [r.right_id for r in out]
    # side purity
    assert all(side[lid] == 0 for lid in lefts)
    assert all(side[rid] == 1 for rid in rights)
    # mutual-best pairs form a 1:1 matching
    assert len(lefts) == len(set(lefts))
    assert len(rights) == len(set(rights))
    # margin floor holds
    assert all(r.margin >= 1.1 for r in out)
    # tightening the threshold only removes pairs
    tight = {
        (r.left_id, r.right_id) for r in _mine(spark, sf_dir, 1.3).collect()
    }
    loose = {(r.left_id, r.right_id) for r in out}
    assert tight <= loose and len(tight) < len(loose)


def test_bitext_reuses_candidate_shuffle(spark, sf_dir):
    out = _mine(spark, sf_dir, 1.1)
    out.collect()
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "ReusedExchange" in plan
