"""Unit tests for the rule-tagger filter framework."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.filters import (
    FilterRule,
    apply_filter_rules,
    with_gopher_tags,
)
from polars_text_spark.plans import explain_str


def test_apply_rules_tags_and_keep(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 50), (3, None)], "doc_id long, v int"
    )
    out = apply_filter_rules(
        df,
        [
            FilterRule("small", F.col("v") < 10),
            FilterRule("positive", F.col("v") > 0),
        ],
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert got[1]["rule_small"] and got[1]["rule_positive"] and got[1]["keep"]
    assert not got[2]["rule_small"] and got[2]["rule_positive"]
    assert not got[2]["keep"]
    # null predicate counts as FAIL, never null
    assert got[3]["rule_small"] is False and got[3]["keep"] is False


def test_apply_rules_validation(spark):
    df = spark.createDataFrame([(1,)], "keep long")
    with pytest.raises(ValueError):
        apply_filter_rules(df, [])
    with pytest.raises(ValueError):
        apply_filter_rules(df, [FilterRule("x", F.lit(True))])
    with pytest.raises(ValueError):
        FilterRule("not an identifier", F.lit(True))


def test_gopher_tags_thresholds(spark):
    rows = [
        # passes everything: 10+ english-ish tokens with stopwords
        (1, "the cat sat on the mat and it was very happy today"),
        # too short
        (2, "the end"),
        # numbers only -> alpha_words fails (and stopwords fails)
        (3, "1 2 3 4 5 6 7 8 9 10 11 12"),
        # no stopword hits
        (4, "cats dogs birds fish mice foxes wolves bears lions tigers"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_gopher_tags(df).collect()}
    assert got[1]["keep"]
    assert not got[2]["rule_token_count"] and not got[2]["keep"]
    assert not got[3]["rule_alpha_words"]
    assert got[4]["rule_token_count"] and not got[4]["rule_stopwords"]
    assert not got[5]["keep"]


def test_gopher_tags_map_only_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = explain_str(with_gopher_tags(df))
    assert "Exchange" not in plan
    assert "Join" not in plan
