"""Concordance tests — semantics from the reference's
tests/test_concordance.py and FIXTURES.md F3."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.functions import concordance
from polars_text_spark.functions.concordance import explode_concordance


def _collect(spark, rows, word, **kwargs):
    df = spark.createDataFrame(rows, ["id", "text"])
    out = df.select("id", concordance("text", word, **kwargs).alias("c")).orderBy("id")
    return {r.id: r.c for r in out.collect()}


def test_basic_matches(spark):
    got = _collect(spark, [(1, "Hello world, hello again.")], "hello")
    matches = got[1]
    assert len(matches) == 2
    first, second = matches
    assert first.matched_text == "Hello"  # original case preserved
    assert (first.start_idx, first.end_idx) == (0, 5)
    assert first.left_context == "" and first.l1 == ""
    assert first.r1 == "world"
    assert second.matched_text == "hello"
    assert second.l1 == ","  # contexts keep punctuation tokens
    assert second.r1 == "again"


def test_case_sensitive(spark):
    got = _collect(spark, [(1, "Hello world, hello again.")], "hello", case_sensitive=True)
    assert len(got[1]) == 1
    assert got[1][0].matched_text == "hello"


def test_null_and_no_match(spark):
    got = _collect(spark, [(1, None), (2, "nothing here")], "zebra")
    assert got[1] == [] and got[2] == []


def test_empty_search_word(spark):
    got = _collect(spark, [(1, "anything")], "")
    assert got[1] == []


def test_window_truncation(spark):
    text = "a b c d e f g TARGET h i j k l m"
    got = _collect(spark, [(1, text)], "TARGET", num_left_tokens=3, num_right_tokens=2)
    m = got[1][0]
    assert m.left_context == "e f g"
    assert m.right_context == "h i"
    assert (m.l1, m.r1) == ("g", "h")


def test_zero_windows(spark):
    got = _collect(spark, [(1, "a TARGET b")], "TARGET", num_left_tokens=0, num_right_tokens=0)
    m = got[1][0]
    assert m.left_context == "" and m.right_context == ""
    assert m.l1 == "" and m.r1 == ""


def test_regex_and_literal_escaping(spark):
    rows = [(1, "cost: $5 (approx)")]
    # literal mode escapes regex metachars
    got = _collect(spark, rows, "$5 (approx)")
    assert len(got[1]) == 1 and got[1][0].matched_text == "$5 (approx)"
    # regex mode matches patterns
    got = _collect(spark, rows, r"\$\d", regex=True)
    assert len(got[1]) == 1 and got[1][0].matched_text == "$5"


def test_explode_unnest_shape(spark):
    """Empty list -> one all-null row after explode+unnest
    (reference tests/test_concordance.py:53-75)."""
    df = spark.createDataFrame([(1, "hello world"), (2, None)], ["id", "text"])
    kwic = explode_concordance(df.select("id", concordance("text", "hello")))
    rows = {r.id: r for r in kwic.collect()}
    assert rows[1].matched_text == "hello"
    assert rows[2].matched_text is None and rows[2].start_idx is None
    assert set(kwic.columns) == {
        "id",
        "left_context",
        "matched_text",
        "right_context",
        "start_idx",
        "end_idx",
        "l1",
        "r1",
    }
