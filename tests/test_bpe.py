"""Distributed BPE trainer (operators/bpe.py): the Sennrich paper
example, greedy-leftmost overlap semantics, segment/learn round-trip,
early stop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.bpe import bpe_learn, bpe_segment


def _corpus(spark, words: dict[str, int]):
    rows = [(" ".join([w] * n),) for w, n in words.items()]
    return spark.createDataFrame(rows, "text string")


def test_sennrich_example(spark):
    # the classic fixture: low x5, lower x2, newest x6, widest x3
    df = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.freq)
        for r in bpe_learn(df, num_merges=5).orderBy("merge_rank").collect()
    ]
    # es/st tie at 9 -> 'e' < 's' wins; then (es,t); lo/ow tie at 7 ->
    # 'l' < 'o'; then (lo,w); then the 6-frequency ties -> (e,w)
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
    ]


def test_overlapping_run_greedy_leftmost(spark):
    # 'aaa': pair (a,a) counts both adjacent positions (freq 2/word),
    # but application merges greedily left-to-right: aaa -> (aa, a)
    df = _corpus(spark, {"aaa": 3})
    m = bpe_learn(df, num_merges=2, min_freq=1).orderBy("merge_rank")
    got = [(r.left_sym, r.right_sym, r.freq) for r in m.collect()]
    assert got == [("a", "a", 6), ("aa", "a", 3)]


def test_segment_applies_merges_in_order(spark):
    df = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_learn(df, num_merges=5)
        .orderBy("merge_rank")
        .collect()
    ]
    words = spark.createDataFrame(
        [("lowest",), ("low",), ("wider",), ("a",)], "w string"
    )
    segs = {
        r.w: r.s
        for r in words.select(
            "w", bpe_segment("w", merges).alias("s")
        ).collect()
    }
    # merges: es, est, lo, low, ew — 'lowest' gets es -> est -> lo
    # -> low applied in rank order
    assert segs["lowest"] == ["low", "est"]
    assert segs["low"] == ["low"]
    assert segs["wider"] == ["w", "i", "d", "e", "r"]
    assert segs["a"] == ["a"]
    # segmentation always reassembles to the word
    for w, s in segs.items():
        assert "".join(s) == w


def test_early_stop_on_min_freq(spark):
    # every word unique: best pair freq is 1 < min_freq=2 -> no merges
    df = _corpus(spark, {"ab": 1, "cd": 1})
    assert bpe_learn(df, num_merges=3, min_freq=2).count() == 0


def test_determinism_across_partitionings(spark):
    df = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    a = bpe_learn(df, num_merges=4).collect()
    b = bpe_learn(df.repartition(7), num_merges=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_num_merges_validation(spark):
    df = _corpus(spark, {"ab": 1})
    with pytest.raises(ValueError, match="num_merges"):
        bpe_learn(df, num_merges=0)
