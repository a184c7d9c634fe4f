"""Winnowing fingerprint tests: the SIGMOD'03 guarantee (a shared
token run of >= w + k - 1 tokens yields >= 1 shared fingerprint),
short-doc conventions, and the viral-fingerprint cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
    with_winnow_fingerprints,
)

K, W = 5, 4
GUARANTEE = W + K - 1  # 8 shared tokens -> >= 1 shared fingerprint


def _fps(spark, *texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    return [
        r["f"]
        for r in df.orderBy("id")
        .select(winnow_fingerprints("text", k=K, w=W).alias("f"))
        .collect()
    ]


def test_shared_run_guarantee(spark):
    run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    assert len(run.split()) == GUARANTEE
    a, b = _fps(
        spark,
        f"left context words here {run} more trailing words",
        f"completely different opening {run} other ending tokens",
    )
    assert set(a) & set(b), "guaranteed shared fingerprint missing"


def test_disjoint_texts_share_nothing(spark):
    a, b = _fps(
        spark,
        "one two three four five six seven eight nine ten",
        "eleven twelve thirteen fourteen fifteen sixteen seventeen",
    )
    assert not (set(a) & set(b))


def test_short_doc_conventions(spark):
    few, empty, null = _fps(spark, "just three tokens", "   ", None)
    assert len(few) == 1  # < k tokens: one whole-run fingerprint
    assert empty == []
    assert null is None


def test_fingerprints_are_deterministic_and_distinct(spark):
    (a,) = _fps(spark, "a b c d e f g h i j k l m n o p q r s t")
    (a2,) = _fps(spark, "a b c d e f g h i j k l m n o p q r s t")
    assert a == a2
    assert len(a) == len(set(a))


def test_overlap_pairs_and_max_df(spark):
    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"doc {i} unique opening {run} unique ending {i}") for i in range(4)]
    rows.append((99, "totally unrelated content with no common passage at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_overlap_pairs(
        df, "text", "doc_id", k=K, w=W, min_shared=1
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    expect = {(i, j) for i in range(4) for j in range(4) if i < j}
    assert got == expect


def test_max_df_kills_viral_fingerprints(spark):
    # four IDENTICAL docs: every fingerprint has document frequency 4,
    # so max_df=3 removes them all and no pairs remain
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, text) for i in range(4)]
    rows.append((99, "totally unrelated content with no common passage at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = winnow_overlap_pairs(df, "text", "doc_id", k=K, w=W, min_shared=1)
    assert uncapped.count() == 6
    capped = winnow_overlap_pairs(
        df, "text", "doc_id", k=K, w=W, min_shared=1, max_df=3
    )
    assert capped.count() == 0


def test_staged_form_matches_expression_form(spark):
    """with_winnow_fingerprints (the O(G)-per-row pipeline path) must
    produce byte-identical fingerprints to the single-expression form
    on every edge case."""
    texts = [
        (1, "a b c d e f g h i j k l m n o p"),
        (2, "just three tokens"),
        (3, "exactly five token gram here"),  # n == k: one gram
        (4, "   "),
        (5, None),
        (6, "a b c d e f"),  # grams=2 < w: global min
    ]
    df = spark.createDataFrame(texts, "id long, text string")
    expr = {
        r["id"]: r["f"]
        for r in df.select(
            "id", winnow_fingerprints("text", k=K, w=W).alias("f")
        ).collect()
    }
    staged = {
        r["id"]: r["f"]
        for r in with_winnow_fingerprints(df, "text", "f", k=K, w=W)
        .select("id", "f")
        .collect()
    }
    assert expr == staged


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k and w"):
        df.select(winnow_fingerprints("text", k=0, w=4)).collect()
