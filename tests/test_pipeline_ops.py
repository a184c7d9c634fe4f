"""Unit tests for the round-3 pipeline operators: as-of join,
decontamination, deterministic sampling, BM25 retrieval, and the
repetition quality signal."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import dup_word_frac
from polars_text_spark.operators.asof import asof_join
from polars_text_spark.operators.decontam import ngram_contamination, token_ngrams
from polars_text_spark.operators.sampling import (
    deterministic_sample,
    rate_threshold_hex,
    sample_predicate,
    stratified_sample,
)
from polars_text_spark.operators.search import bm25_scores, bm25_topk


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10.0), lv=1),
            Row(k="a", ts=_ts(20.0), lv=2),
            Row(k="a", ts=_ts(5.0), lv=3),   # before any right row
            Row(k="b", ts=_ts(100.0), lv=4),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(8.0), rv=80),
            Row(k="a", ts=_ts(10.0), rv=100),  # equal-ts: inclusive match
            Row(k="a", ts=_ts(15.0), rv=150),
        ]
    )
    return left, right


def test_asof_backward_inclusive(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_cols=["ts", "rv"])
    got = {r.lv: (r.ts_right, r.rv_right) for r in out.collect()}
    assert len(got) == 4  # every left row kept
    assert got[1] == (_ts(10.0), 100)  # equal ts matches (inclusive)
    assert got[2] == (_ts(15.0), 150)  # most recent, not first
    assert got[3] == (None, None)      # left row older than all right rows
    assert got[4] == (None, None)      # key absent from right


def test_asof_tolerance(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_cols=["ts", "rv"],
        tolerance_us=2_000_000,
    )
    got = {r.lv: r.rv_right for r in out.collect()}
    assert got[1] == 100   # gap 0s <= 2s
    assert got[2] is None  # gap 5s > 2s -> dropped to null, row kept


def test_asof_single_shuffle_no_join(spark, asof_frames):
    """The plan must be the union+window form: no join node at all."""
    left, right = asof_frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_cols=["ts"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


# ---------------------------------------------------------------------------
# gapfill_locf
# ---------------------------------------------------------------------------


def _hr(h):
    return dt.datetime(2024, 1, 1, h)


def test_gapfill_locf_fills_and_flags(spark):
    from polars_text_spark.operators.asof import gapfill_locf

    rows = [
        # key a: observations at 00, 03 (null value), 05 — gaps 01, 02, 04
        ("a", _hr(0), 10.0),
        ("a", _hr(3), None),
        ("a", _hr(5), 50.0),
        # key b: single observation — grid is one tick, no gaps
        ("b", _hr(7), 7.0),
    ]
    df = spark.createDataFrame(rows, ["k", "bucket", "v"])
    out = {
        (r["k"], r["bucket"].hour): (r["v"], r["is_gap"])
        for r in gapfill_locf(df, ["k"], "bucket", ["v"]).collect()
    }
    # dense grid from min to max per key
    assert sorted(h for k, h in out if k == "a") == [0, 1, 2, 3, 4, 5]
    assert sorted(h for k, h in out if k == "b") == [7]
    # LOCF: gaps carry 10.0; the NULL OBSERVATION at 03 is not a gap
    # but still carries the previous non-null (IGNORE NULLS)
    assert out[("a", 0)] == (10.0, False)
    assert out[("a", 1)] == (10.0, True)
    assert out[("a", 2)] == (10.0, True)
    assert out[("a", 3)] == (10.0, False)
    assert out[("a", 4)] == (10.0, True)
    assert out[("a", 5)] == (50.0, False)
    assert out[("b", 7)] == (7.0, False)


def test_gapfill_locf_no_join_one_main_shuffle(spark):
    """Union + running window, never a grid-to-data join; the only
    non-broadcast Exchanges are the per-key min/max aggregate and the
    keys window — a range-join regression shows up as a Join node."""
    from polars_text_spark.operators.asof import gapfill_locf

    df = spark.createDataFrame(
        [("a", _hr(0), 1.0), ("a", _hr(4), 2.0)], ["k", "bucket", "v"]
    )
    out = gapfill_locf(df, ["k"], "bucket", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_gapfill_locf_ignores_null_tick_observations(spark):
    """A row with a null timestamp must not be carried into early
    grid ticks (ascending sort puts nulls first): hr0 has a null
    VALUE observation, so its LOCF output is null, not the
    null-tick row's 99.0."""
    from polars_text_spark.operators.asof import gapfill_locf

    df = spark.createDataFrame(
        [("a", None, 99.0), ("a", _hr(0), None), ("a", _hr(1), 5.0)],
        "k string, bucket timestamp, v double",
    )
    out = {
        r["bucket"].hour: (r["v"], r["is_gap"])
        for r in gapfill_locf(df, ["k"], "bucket", ["v"]).collect()
    }
    assert out == {0: (None, False), 1: (5.0, False)}


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_token_ngrams_short_doc_whole_text(spark):
    df = spark.createDataFrame([Row(text="only two")])
    [row] = df.select(token_ngrams(F.col("text"), 4).alias("g")).collect()
    assert row.g == ["only two"]


def test_ngram_contamination_counts(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma delta epsilon")]
    )
    cand = spark.createDataFrame(
        [
            # shares two distinct 4-grams with bench doc 0
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            # no overlap
            Row(doc_id=2, text="one two three four five six"),
        ]
    )
    out = ngram_contamination(cand, bench, n=4).collect()
    assert len(out) == 1
    [r] = out
    assert r.doc_id == 1
    assert r.n_shared_shingles == 2
    assert r.n_bench_docs == 1


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_rate_threshold_hex_bounds():
    assert rate_threshold_hex(0.5) == "80000000"
    assert rate_threshold_hex(0.0) == "00000000"
    with pytest.raises(ValueError):
        rate_threshold_hex(1.5)


def test_deterministic_sample_stable_and_salted(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, 0.3, "k").collect()}
    b = {r.k for r in deterministic_sample(df, 0.3, "k").collect()}
    assert a == b  # rerun-stable
    assert 0.2 < len(a) / 2000 < 0.4  # ~rate
    # nested rates: a 0.1 sample is a subset of the 0.3 sample (same salt)
    c = {r.k for r in deterministic_sample(df, 0.1, "k").collect()}
    assert c <= a
    # a different salt decorrelates
    d = {r.k for r in deterministic_sample(df, 0.3, "k", salt="x").collect()}
    assert d != a


def test_stratified_sample_rates(spark):
    rows = [Row(k=i, s="big" if i % 2 else "small") for i in range(2000)]
    df = spark.createDataFrame(rows)
    out = stratified_sample(
        df, {"big": 0.2, "small": 1.0}, "s", "k", default_rate=0.0
    )
    by_s = {
        r.s: r.n
        for r in out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_s["small"] == 1000  # rate 1.0 keeps everything
    assert 100 < by_s["big"] < 300  # ~20% of 1000


def test_sample_predicate_edge_rates(spark):
    df = spark.range(0, 50).withColumnRenamed("id", "k")
    assert df.filter(sample_predicate(F.col("k"), 1.0)).count() == 50
    assert df.filter(sample_predicate(F.col("k"), 0.0)).count() == 0


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bm25_corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark query"),
            Row(doc_id=2, text="spark query engine"),
            Row(doc_id=3, text="engine internals only"),
            Row(doc_id=4, text="nothing relevant here"),
        ]
    )


def test_bm25_scores_and_ranking(spark, bm25_corpus):
    scores = {
        r.doc_id: r.score
        for r in bm25_scores(bm25_corpus, ["spark", "query"]).collect()
    }
    # docs 3 and 4 contain no query term -> absent entirely
    assert set(scores) == {1, 2}
    # doc 1 (tf=3 for spark + a query hit) beats doc 2 (one of each)
    assert scores[1] > scores[2]
    assert all(v > 0 for v in scores.values())


def test_bm25_topk_cut_and_tiebreak(spark, bm25_corpus):
    top = bm25_topk(bm25_corpus, ["spark", "query"], k=2).collect()
    assert [r.doc_id for r in top] == [1, 2]
    with pytest.raises(ValueError):
        bm25_scores(bm25_corpus, [])


# ---------------------------------------------------------------------------
# repetition signal
# ---------------------------------------------------------------------------


def test_dup_word_frac(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a b"),
            Row(doc_id=2, text="x y z"),
            Row(doc_id=3, text=""),
            Row(doc_id=4, text=None),
        ]
    )
    got = {
        r.doc_id: r.dup_word_frac
        for r in df.select("doc_id", dup_word_frac("text")).collect()
    }
    assert got[1] == pytest.approx(1.0 - 2.0 / 3.0)
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert got[4] == 0.0


# ---------------------------------------------------------------------------
# Scale-shape plan assertions (the 100 TB contracts, not just results)
# ---------------------------------------------------------------------------


def test_decontam_broadcasts_bench_side(spark, sf_dir):
    from polars_text_spark.plans import explain_str, has_broadcast_join

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    cand = docs.filter(F.col("doc_id") % 10 != 0)
    out = ngram_contamination(cand, bench, n=4)
    assert has_broadcast_join(out)
    # the big (candidate) side must not sort-merge for the join
    assert "SortMergeJoin" not in explain_str(out, "simple")


def test_bm25_joins_are_broadcast(spark, sf_dir):
    from polars_text_spark.plans import explain_str

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bm25_scores(docs, ["hash", "join"])
    plan = explain_str(out, "simple")
    assert "SortMergeJoin" not in plan  # df + stats joins stay broadcast


def test_sampling_is_scan_level_filter(spark, sf_dir):
    from polars_text_spark.plans import explain_str

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = deterministic_sample(docs, 0.25, "doc_id")
    plan = explain_str(out, "simple")
    assert "Exchange" not in plan  # zero shuffle: filter fused into scan
