"""Corpus-linguistics operators: n-grams, collocations, Gries DP."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.linguistics import (
    collocations,
    dispersion,
    ngram_counts,
)


def _frame(spark, rows, part=False):
    if part:
        return spark.createDataFrame(rows, "part string, text string")
    return spark.createDataFrame([(r,) for r in rows], "text string")


def test_ngram_counts_hand_computed(spark):
    df = _frame(spark, ["a b a b c", "b c", None, "  ", "a"])
    got = {
        (r["ngram"], r["count"])
        for r in ngram_counts(df, n=2).collect()
    }
    # "a b a b c" -> a b, b a, a b, b c ; "b c" -> b c ; "a" too short
    assert got == {("a b", 2), ("b a", 1), ("b c", 2)}


def test_ngram_counts_n1_equals_unigrams_and_min_count(spark):
    df = _frame(spark, ["x y x", "y z"])
    got = {(r["ngram"], r["count"]) for r in ngram_counts(df, n=1).collect()}
    assert got == {("x", 2), ("y", 2), ("z", 1)}
    filtered = {r["ngram"] for r in ngram_counts(df, n=1, min_count=2).collect()}
    assert filtered == {"x", "y"}
    with pytest.raises(ValueError):
        ngram_counts(df, n=0)
    with pytest.raises(ValueError):
        ngram_counts(df, min_count=0)


def test_collocations_hand_computed(spark):
    # one doc "a b a b": window=1 pairs: (a,b) x2, (b,a) x1 -> M=3, N=4
    df = _frame(spark, ["a b a b"])
    rows = {
        (r["a"], r["b"]): r
        for r in collocations(df, window=1, min_pair_count=1).collect()
    }
    assert set(rows) == {("a", "b"), ("b", "a")}
    ab = rows[("a", "b")]
    assert (ab["pair_count"], ab["count_a"], ab["count_b"]) == (2, 2, 2)
    # pmi = log2((2/3) / (0.5*0.5)) = log2(8/3)
    assert ab["pmi"] == pytest.approx(math.log2(8 / 3), abs=1e-6)
    # log_dice = 14 + log2(2*2/(2+2)) = 14
    assert ab["log_dice"] == pytest.approx(14.0, abs=1e-6)
    ba = rows[("b", "a")]
    assert ba["pair_count"] == 1
    assert ba["pmi"] == pytest.approx(math.log2((1 / 3) / 0.25), abs=1e-6)


def test_collocations_window_reaches_and_min_pair(spark):
    df = _frame(spark, ["a x b", "a y b"])
    rows = {
        (r["a"], r["b"]): r["pair_count"]
        for r in collocations(df, window=2, min_pair_count=2).collect()
    }
    # only (a,b) occurs twice (distance 2 in both docs)
    assert rows == {("a", "b"): 2}
    with pytest.raises(ValueError):
        collocations(df, window=0)


def test_collocations_broadcast_flag_equivalent(spark):
    df = _frame(spark, ["a b c a b", "c a b"])
    a = sorted(
        map(tuple, collocations(df, window=2, broadcast_unigrams=True).collect())
    )
    b = sorted(
        map(tuple, collocations(df, window=2, broadcast_unigrams=False).collect())
    )
    assert a == b and a


def test_dispersion_even_and_concentrated(spark):
    # 2 parts, equal sizes. "e" appears once in each -> DP 0.
    # "c" appears twice, both in part p1 -> DP = 0.5*(|1-0.5| + 0.5) = 0.5.
    df = _frame(
        spark,
        [("p1", "e c c x"), ("p2", "e x x x")],
        part=True,
    )
    rows = {r["token"]: r for r in dispersion(df, "part").collect()}
    assert rows["e"]["dp"] == pytest.approx(0.0, abs=1e-6)
    assert rows["e"]["range_parts"] == 2
    assert rows["c"]["dp"] == pytest.approx(0.5, abs=1e-6)
    assert rows["c"]["range_parts"] == 1
    # dp_norm = dp / (1 - min_share) = 0.5 / 0.5 = 1.0
    assert rows["c"]["dp_norm"] == pytest.approx(1.0, abs=1e-6)
    assert rows["c"]["freq"] == 2


def test_dispersion_uneven_parts_closed_form(spark):
    # parts sized 3 and 1 -> shares 0.75/0.25. token "z" only in small part:
    # DP = 0.5*(|1-0.25| + 0.75) = 0.75 ; dp_norm = 0.75/(1-0.25) = 1.0
    df = _frame(spark, [("big", "a a a"), ("small", "z")], part=True)
    rows = {r["token"]: r for r in dispersion(df, "part").collect()}
    assert rows["z"]["dp"] == pytest.approx(0.75, abs=1e-6)
    assert rows["z"]["dp_norm"] == pytest.approx(1.0, abs=1e-6)
    assert rows["a"]["dp"] == pytest.approx(0.25, abs=1e-6)
    # min_count filter
    kept = {r["token"] for r in dispersion(df, "part", min_count=2).collect()}
    assert kept == {"a"}


def test_ngram_and_pair_generation_is_map_only(spark, sf_dir):
    """Gram/pair construction must not shuffle the token stream twice:
    exactly one Exchange below each final aggregate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = ngram_counts(docs, n=3)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # collocations: pair generation must be array-built per row, never a
    # positional self-join — no sort-merge join anywhere (marginals are
    # broadcast), and every hash shuffle partitions on the pair key or
    # the token key, never on a position column.
    plan2 = (
        collocations(docs, window=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert "SortMergeJoin" not in plan2
    assert "CartesianProduct" not in plan2
    for line in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan2):
        keys = {c.split("#")[0].strip() for c in line.split(",")[:-1]}
        assert keys <= {"a", "b", "token"}, line


def test_vocab_spelling_pairs_symspell_blocking(spark):
    from polars_text_spark.operators.linguistics import vocab_spelling_pairs

    rows = [
        ("color color color colour colour colour",),   # deletion pair
        ("cat bat cat bat cat bat",),                  # substitution pair
        ("table tabel table tabel table tabel",),      # transposition: dist 2, NOT matched
        ("x y x y x y",),                              # single-char substitution pair
    ]
    df = spark.createDataFrame(rows, "text string")
    got = {
        (r["a"], r["b"]): (r["count_a"], r["count_b"])
        for r in vocab_spelling_pairs(df, min_count=3).collect()
    }
    assert ("color", "colour") in got
    assert ("bat", "cat") in got
    assert ("x", "y") in got
    assert ("tabel", "table") not in got  # transposition = 2 ops
    assert got[("color", "colour")] == (3, 3)
    # min_count filters rare tokens out
    none = vocab_spelling_pairs(
        spark.createDataFrame([("cat bat",)], "text string"), min_count=3
    ).collect()
    assert none == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vocab_spelling_pairs(df, min_count=0)


def test_node_collocates_hand_computed(spark):
    from polars_text_spark.operators.linguistics import node_collocates

    # "n x n y" window=1: stream for node 'n': R-neighbors x,y; L-neighbor x
    df = _frame(spark, ["n x n y"])
    rows = {
        r["collocate"]: r
        for r in node_collocates(df, "n", window=1, min_count=1).collect()
    }
    assert rows["x"]["obs"] == 2  # right of first n, left of second n
    assert rows["y"]["obs"] == 1
    assert rows["x"]["corpus_count"] == 1
    # T=3 slots, N=4 tokens: mi(x) = log2((2/3)/(1/4)) = log2(8/3)
    assert rows["x"]["mi"] == pytest.approx(math.log2(8 / 3), abs=1e-6)
    with pytest.raises(ValueError):
        node_collocates(df, "", window=1)
    with pytest.raises(ValueError):
        node_collocates(df, "n", window=0)
