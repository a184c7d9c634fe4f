"""Round-7 batch 3: readability, KWIC dispersion bins, snapshot diff,
prefix boilerplate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import readability
from polars_text_spark.operators.linguistics import (
    prefix_boilerplate,
    term_dispersion_bins,
)
from polars_text_spark.operators.snapshots import snapshot_diff


def test_readability_hand_computed(spark):
    # "The cat sat. It ran!" -> 5 words, 2 sentences
    # syllables: the=1, cat=1, sat=1, it=1, ran=1 -> 5
    df = spark.createDataFrame([("The cat sat. It ran!",), ("",), (None,)],
                               "text string")
    rows = df.select(readability("text").alias("r")).collect()
    r = rows[0]["r"]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    w_s, y_w = 5 / 2, 5 / 5
    assert r["flesch"] == pytest.approx(206.835 - 1.015 * w_s - 84.6 * y_w)
    assert r["fk_grade"] == pytest.approx(0.39 * w_s + 11.8 * y_w - 15.59)
    empty = rows[1]["r"]
    assert empty["n_words"] == 0 and empty["flesch"] is None
    # multi-syllable: "beautiful" -> eau/i/u = 3 vowel groups
    r2 = (
        spark.createDataFrame([("beautiful.",)], "text string")
        .select(readability("text").alias("r"))
        .collect()[0]["r"]
    )
    assert r2["n_syllables"] == 3
    # consonant-only word floors at 1 syllable
    r3 = (
        spark.createDataFrame([("hmm grr.",)], "text string")
        .select(readability("text").alias("r"))
        .collect()[0]["r"]
    )
    assert r3["n_syllables"] == 2


def test_term_dispersion_bins(spark):
    # 10 tokens, "x" at 0-based positions 0, 5, 9 -> bins 0, 5, 9
    text = "x a b c d x e f g x"
    df = spark.createDataFrame([(1, text), (2, "no hits here")],
                               "doc_id long, text string")
    rows = term_dispersion_bins(df, "x", bins=10).collect()
    got = {(r["doc_id"], r["bin"]): r["hits"] for r in rows}
    assert got == {(1, 0): 1, (1, 5): 1, (1, 9): 1}
    # two hits landing in one bin aggregate
    df2 = spark.createDataFrame([(1, "x x y y")], "doc_id long, text string")
    got2 = {(r["bin"]): r["hits"] for r in term_dispersion_bins(df2, "x", bins=2).collect()}
    assert got2 == {0: 2}
    with pytest.raises(ValueError):
        term_dispersion_bins(df, "", bins=10)
    with pytest.raises(ValueError):
        term_dispersion_bins(df, "x", bins=0)


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gone"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta CHANGED"), (5, "fresh"), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "modified",
        3: "removed",
        4: "unchanged",  # null == null via null-safe equality
        5: "added",
    }


def test_snapshot_diff_null_vs_text_is_modified(spark):
    old = spark.createDataFrame([(1, None)], "doc_id long, text string")
    new = spark.createDataFrame([(1, "now has text")], "doc_id long, text string")
    assert snapshot_diff(old, new).collect()[0]["status"] == "modified"


def test_prefix_boilerplate(spark):
    rows = [
        ("web", "breaking news today alpha"),
        ("web", "breaking news today beta"),
        ("web", "breaking news now gamma"),
        ("web", "totally different opening"),
        ("books", "breaking news today delta"),  # other group: own count
        ("books", "short"),  # < k tokens: excluded
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source"], r["prefix"]): r["n_docs"]
        for r in prefix_boilerplate(df, "source", k_tokens=3, min_docs=2).collect()
    }
    assert got == {("web", "breaking news today"): 2}
    # k=2 folds all three "breaking news" docs together
    got2 = {
        (r["source"], r["prefix"]): r["n_docs"]
        for r in prefix_boilerplate(df, "source", k_tokens=2, min_docs=2).collect()
    }
    assert got2 == {("web", "breaking news"): 3}
    with pytest.raises(ValueError):
        prefix_boilerplate(df, "source", k_tokens=0)
