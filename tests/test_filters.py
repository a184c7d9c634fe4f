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


def test_c4_clean_lines_hand_cases(spark):
    from polars_text_spark.operators.filters import c4_clean_lines

    text = "\n".join(
        [
            "This is a good long sentence that stays.",   # kept
            "Too short.",                                   # < 5 words
            "This line has five words here",                # no terminator
            "Please enable javascript to view this page.",  # javascript
            "Read our privacy policy before you continue.", # policy phrase
            'He said the quote ends with a "mark."',        # kept (. end)
            "Another perfectly ordinary sentence survives the filter!",
        ]
    )
    df = spark.createDataFrame([(1, text), (2, None)], "doc_id long, text string")
    got = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id", c4_clean_lines("text").alias("c")
        ).collect()
    }
    kept = got[1].split("\n")
    assert kept == [
        "This is a good long sentence that stays.",
        'He said the quote ends with a "mark."',
        "Another perfectly ordinary sentence survives the filter!",
    ]
    assert got[2] is None


def test_c4_tags_hand_cases(spark):
    from polars_text_spark.operators.filters import with_c4_tags

    good = (
        "First ordinary sentence with enough words here.\n"
        "Second ordinary sentence with enough words too.\n"
        "Third ordinary sentence rounds out the page."
    )
    # the brace sits MID-line so the line survives cleaning (a line
    # ending in '}' would be dropped for its missing terminator and
    # the page would fail min_sentences instead)
    code = (
        "First ordinary sentence keeps a { brace mid-line anyway.\n"
        "Second ordinary sentence with enough words too.\n"
        "Third ordinary sentence rounds out the page."
    )
    lorem = good.replace("Second ordinary", "Second lorem ipsum style")
    short = "Only one ordinary sentence with enough words."
    df = spark.createDataFrame(
        [(1, good), (2, code), (3, lorem), (4, short)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in with_c4_tags(df).collect()}
    assert got[1].keep
    assert not got[2].rule_no_curly_brace and not got[2].keep
    assert not got[3].rule_no_lorem_ipsum and not got[3].keep
    assert not got[4].rule_min_sentences and not got[4].keep
    # bad-words rule only appears when a list is supplied
    assert "rule_no_bad_words" not in got[1].asDict()
    tagged = {
        r.doc_id: r
        for r in with_c4_tags(df, bad_words=("ordinary",)).collect()
    }
    assert not tagged[1].rule_no_bad_words and not tagged[1].keep


def test_c4_tags_map_only_plan(spark):
    from polars_text_spark.operators.filters import with_c4_tags

    df = spark.createDataFrame([(1, "A sentence that is long enough here.")],
                               "doc_id long, text string")
    plan = explain_str(with_c4_tags(df, bad_words=("x",)))
    assert "Exchange" not in plan
