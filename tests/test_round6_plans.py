"""Physical-plan assertions for the round-6 operators: pin the plan
we'd want at 100 TB, not just a plan that passes."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.semdedup import (
    kmeans_assign,
    semantic_dup_pairs,
)
from polars_text_spark.operators.spans import dup_ngram_coverage
from polars_text_spark.plans import explain_str


def _docs(spark):
    rows = [(i, f"tok{i} alpha beta gamma delta epsilon") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vecs(spark):
    rows = [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_assignment_is_map_only(spark):
    """The per-iteration ASSIGNMENT is one projection over the input:
    centroids ride as literals, so the final assignment plan has no
    join, no aggregate and no exchange."""
    plan = explain_str(kmeans_assign(_vecs(spark), k=4, iterations=1))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_semantic_pairs_no_cartesian(spark):
    """Candidate generation is an equi-join on the cluster id — never
    a cross join."""
    plan = explain_str(semantic_dup_pairs(_vecs(spark), k=4, tau=0.9))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dup_span_coverage_no_cartesian_and_no_text_shuffle(spark):
    """Only (id, start, hash) longs shuffle: the text column must not
    appear in any exchange input, and there is no cross join."""
    out = dup_ngram_coverage(_docs(spark), n=3, min_df=2)
    plan = explain_str(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the gram-frequency aggregate must be partial (map-side combine)
    assert "partial_count" in plan


def test_spread_scan_widens_and_is_identity_when_wide(spark, sf_dir):
    from polars_text_spark.sources.catalog import spread_scan

    scan = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    widened = spread_scan(scan)
    assert widened.rdd.getNumPartitions() == target
    assert widened.count() == scan.count()
    # already-wide input: identity, no exchange added
    wide = scan.repartition(target + 5)
    assert spread_scan(wide) is wide


def test_dup_span_coverage_gram_expression_not_duplicated(spark):
    """The gram pipeline appears EXACTLY twice: once per consumer of
    the exploded stream (frequency agg + join-back) — a deliberate
    recompute-over-materialize trade (see operators/spans.py). What
    this pins: (a) explode_outer keeps InferFiltersFromGenerate from
    cloning it into a pre-generate filter, and (b) the profile side
    computes n_grams arithmetically instead of size(<gram expr>) —
    either regression pushes the count up. Round 14: the production
    default is the v2 token-hash-window family, so the marker is
    xxhash64 (2 per pipeline instance: the token-hash transform + the
    window hash) — 4 total for the two consumers; the sha oracle
    family keeps the old 2x sha2 shape."""
    out = dup_ngram_coverage(_docs(spark), n=3, min_df=2)
    plan = explain_str(out)
    assert plan.count("xxhash64") == 4 and plan.count("sha2") == 0

    from polars_text_spark.operators.dedup import sha_token_hash

    sha_out = dup_ngram_coverage(
        _docs(spark), n=3, min_df=2, gram_hash=sha_token_hash
    )
    assert explain_str(sha_out).count("sha2") == 2
