"""Unit tests for duplicated n-gram span coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.spans import (
    dup_ngram_coverage,
    strip_duplicate_spans,
)


def _collect(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_shared_passage_merges_overlapping_grams(spark):
    # docs 1 and 2 share the 6-token passage "a b c d e f"; with n=3
    # that is 4 duplicated grams per doc merging into ONE 6-token span
    rows = [
        (1, "a b c d e f x1 y1 z1"),
        (2, "q2 a b c d e f w2"),
        (3, "totally different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(dup_ngram_coverage(df, n=3, min_df=2))

    assert got[1]["n_tokens"] == 9
    assert got[1]["n_grams"] == 7
    assert got[1]["n_dup_grams"] == 4
    assert got[1]["dup_tokens"] == 6
    assert got[1]["dup_frac"] == pytest.approx(6 / 9, abs=1e-6)

    assert got[2]["n_dup_grams"] == 4
    assert got[2]["dup_tokens"] == 6

    assert got[3]["n_dup_grams"] == 0
    assert got[3]["dup_tokens"] == 0
    assert got[3]["dup_frac"] == 0.0


def test_disjoint_duplicate_spans_sum(spark):
    # "a b c" (start) and "x y z" (end) both duplicated, separated by
    # unique middles: two disjoint 3-token spans = 6 covered tokens
    rows = [
        (1, "a b c m1 m2 x y z"),
        (2, "a b c k1 k2 k3 x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(dup_ngram_coverage(df, n=3, min_df=2))
    assert got[1]["dup_tokens"] == 6
    assert got[2]["dup_tokens"] == 6


def test_self_repetition_counts_toward_min_df(spark):
    # the same gram twice within ONE doc reaches min_df=2 on its own
    rows = [(1, "spam spam spam spam"), (2, "clean words only here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(dup_ngram_coverage(df, n=3, min_df=2))
    # grams: (spam spam spam) at starts 0 and 1 -> both duplicated,
    # merged span covers all 4 tokens
    assert got[1]["n_dup_grams"] == 2
    assert got[1]["dup_tokens"] == 4
    assert got[1]["dup_frac"] == 1.0
    assert got[2]["n_dup_grams"] == 0


def test_short_null_and_empty_docs(spark):
    rows = [(1, "a b"), (2, None), (3, "   "), (4, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(dup_ngram_coverage(df, n=3, min_df=2))
    for i in (1, 2, 3, 4):
        assert got[i]["n_grams"] == 0
        assert got[i]["n_dup_grams"] == 0
        assert got[i]["dup_tokens"] == 0
        assert got[i]["dup_frac"] == 0.0
    assert got[1]["n_tokens"] == 2
    assert got[2]["n_tokens"] == 0
    assert got[3]["n_tokens"] == 0


def test_dup_frac_bounded_and_case_insensitive(spark):
    rows = [(1, "Foo Bar Baz qux"), (2, "foo bar baz different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(dup_ngram_coverage(df, n=3, min_df=2))
    # "foo bar baz" duplicated across docs despite case difference
    assert got[1]["n_dup_grams"] == 1
    assert got[2]["n_dup_grams"] == 1
    for r in got.values():
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_rejects_bad_params_and_collisions(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dup_ngram_coverage(df, n=0)
    with pytest.raises(ValueError):
        dup_ngram_coverage(df, min_df=1)
    clash = df.withColumn("__sp_toks", F.lit(1))
    with pytest.raises(ValueError):
        dup_ngram_coverage(clash)


def test_strip_drops_every_occurrence(spark):
    # shared passage "a b c" stripped from BOTH docs (no keep-first)
    rows = [
        (1, "a b c u1 u2"),
        (2, "w1 a b c w2"),
        (3, "all original words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_spans(df, n=3, min_df=2).collect()
    }
    assert got[1] == "u1 u2"
    assert got[2] == "w1 w2"
    assert got[3] == "all original words"


def test_strip_fully_duplicated_doc_becomes_empty(spark):
    rows = [(1, "Copy Pasta Text"), (2, "copy pasta text"), (3, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_spans(df, n=3, min_df=2).collect()
    }
    assert got[1] == "" and got[2] == ""
    assert got[3] == "a b"  # shorter than n: never covered


def test_strip_consistent_with_coverage_counts(spark):
    rows = [
        (1, "x y z m1 m2 p q r"),
        (2, "x y z k1 k2 k3 p q r"),
        (3, "nothing shared here at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cov = {
        r["doc_id"]: r
        for r in dup_ngram_coverage(df, n=3, min_df=2).collect()
    }
    stripped = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_spans(df, n=3, min_df=2).collect()
    }
    for i in (1, 2, 3, 4):
        kept_tokens = len(stripped[i].split()) if stripped[i] else 0
        assert kept_tokens == cov[i]["n_tokens"] - cov[i]["dup_tokens"]


def test_dup_source_matrix_combinatorics(spark):
    from polars_text_spark.operators.dedup import dup_source_matrix

    # fingerprint X: sources A, A, B -> A-A: C(2,2)=1, A-B: 2*1=2
    # fingerprint Y: sources B, B    -> B-B: 1
    # unique doc contributes nothing
    rows = [
        (1, "same one", "A"),
        (2, "same one", "A"),
        (3, "same one", "B"),
        (4, "other dup", "B"),
        (5, "other dup", "B"),
        (6, "unique text", "A"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in dup_source_matrix(df).collect()
    }
    assert got == {("A", "A"): 1, ("A", "B"): 2, ("B", "B"): 1}


def test_xxhash_fast_path_same_shape(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(
        dup_ngram_coverage(df, n=3, min_df=2, gram_hash=F.xxhash64)
    )
    assert got[1]["dup_tokens"] == 5 and got[2]["dup_tokens"] == 5
