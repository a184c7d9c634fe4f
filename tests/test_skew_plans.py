"""Salted-join semantics + physical-plan assertions for the round-5
operators (interval join, PII scan, salted join): pin the plan we'd
want at 100 TB, not just a plan that passes."""

from __future__ import annotations

import pytest
import re
from pyspark.sql import functions as F

from polars_text_spark.operators.interval import interval_join
from polars_text_spark.operators.pii import pii_counts, redact_pii
from polars_text_spark.operators.skew import salted_join
from polars_text_spark.plans import explain_str


def _skewed_frames(spark):
    # one hot key carrying 80% of the big side
    big = spark.createDataFrame(
        [(("hot" if i % 5 != 0 else f"k{i}"), i) for i in range(500)],
        "k string, v long",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k5", 3), ("absent", 4)], "k string, w long"
    )
    return big, small


def test_salted_join_matches_plain_inner(spark):
    big, small = _skewed_frames(spark)
    for salt in (1, 4, 16):
        got = salted_join(big, small, ["k"], salt=salt)
        plain = big.join(small, ["k"])
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, plain.collect())
        ), salt


def test_salted_join_matches_plain_left(spark):
    big, small = _skewed_frames(spark)
    got = salted_join(big, small, ["k"], salt=4, how="left")
    plain = big.join(small, ["k"], "left")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_salt_col_path(spark):
    """salt_col (single-column content hash, the cheap deterministic
    salt) joins identically to the plain join."""
    big, small = _skewed_frames(spark)
    got = salted_join(big, small, ["k"], salt=4, salt_col="v")
    plain = big.join(small, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    got_left = salted_join(big, small, ["k"], salt=4, salt_col="v", how="left")
    plain_left = big.join(small, ["k"], "left")
    assert sorted(map(tuple, got_left.collect())) == sorted(
        map(tuple, plain_left.collect())
    )


def test_salted_join_validations(spark):
    big, small = _skewed_frames(spark)
    with pytest.raises(ValueError, match="salt"):
        salted_join(big, small, ["k"], salt=0)
    with pytest.raises(ValueError, match="how"):
        salted_join(big, small, ["k"], how="right")


def test_salted_join_shuffles_on_salt(spark):
    """With broadcast disabled, the shuffle key must include the salt
    — that's the whole mechanism (a hot key spreads over `salt`
    reducers)."""
    big, small = _skewed_frames(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(salted_join(big, small, ["k"], salt=8))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "__salt" in plan
    assert "hashpartitioning(k" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_plan_is_equi_join(spark):
    """The binned range join must never degrade to the
    nested-loop/cartesian plan Catalyst gives raw BETWEEN conditions."""
    import datetime

    points = spark.createDataFrame(
        [(1, "u", datetime.datetime(2024, 1, 1, 9))],
        "event_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("u", datetime.datetime(2024, 1, 1, 8), datetime.datetime(2024, 1, 1, 10))],
        "user_id string, start_ts timestamp, end_ts timestamp",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(
            interval_join(points, intervals, on=["user_id"], bucket_seconds=3600)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # equi-join on (user_id, bucket): the bucket reaches the join key
    assert "__bucket" in plan


def test_pii_scan_is_map_only(spark, sf_dir):
    """PII counting/redaction is a projection fused into the scan: no
    Exchange (shuffle) anywhere in the plan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.select(
        "doc_id",
        pii_counts("text").alias("p"),
        F.length(redact_pii("text")).alias("rl"),
    )
    plan = explain_str(q)
    assert "Exchange" not in plan
    # column pruning: the scan must not read lang/source
    assert "lang" not in plan.split("ReadSchema")[-1][:200]


def test_cosine_topk_has_partial_rank_limit_before_shuffle(spark, sf_dir):
    """The exact top-k's `rank <= k` filter must trigger rank-limit
    pushdown (SPARK-37099): a Partial-mode WindowGroupLimit BELOW the
    query_id Exchange, so each map task ships at most k rows per query
    into the shuffle instead of its whole candidate slice. Pins the
    SCALING.md claim; a Spark upgrade or rank_topk refactor that loses
    the rewrite fails here, not in a 100x-scale run."""
    from polars_text_spark.operators.similarity import cosine_topk

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = vecs.filter(F.col("vec_id") < 3)
    plan = explain_str(cosine_topk(vecs, qs, k=5), "formatted")
    partial = re.search(r"\((\d+)\) WindowGroupLimit\b.*", plan)
    assert partial, "rank-limit pushdown missing entirely"
    # formatted explain prints the tree top-down: the Partial node
    # must appear deeper (later line) than the Exchange feeding the
    # final window, i.e. below it in the plan tree.
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    ex = [i for i, l in enumerate(lines) if "Exchange" in l and "Broadcast" not in l]
    pt = [i for i, l in enumerate(lines) if "WindowGroupLimit" in l]
    assert ex and pt
    assert max(pt) > max(ex), "no WindowGroupLimit below the shuffle"
    assert ", Partial" in plan and ", Final" in plan


@pytest.mark.parametrize("variant", ["quantized", "lsh_sha", "ivf"])
def test_topk_variants_keep_partial_rank_limit(spark, sf_dir, variant):
    """Every top-k family shares the `row_number <= k` shape, so the
    SPARK-37099 partial WindowGroupLimit must appear below the final
    per-query Exchange in ALL of them, not just the exact path — a
    refactor of one variant's rank filter silently loses the map-side
    k-row cap for that family only."""
    from polars_text_spark.operators import similarity as sim

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = vecs.filter(F.col("vec_id") < 3)
    if variant == "quantized":
        df = sim.cosine_topk_quantized(vecs, qs, k=5)
    elif variant == "lsh_sha":
        df = sim.cosine_topk_lsh_sha(vecs, qs, k=5, dim=64)
    else:
        df = sim.cosine_topk_ivf(vecs, qs, k=5)
    plan = explain_str(df, "formatted")
    assert "WindowGroupLimit" in plan, plan
    assert ", Partial" in plan and ", Final" in plan
