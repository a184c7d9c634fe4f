"""DSIR importance-resampling tests: an independent pure-Python
reimplementation of the whole hashed-n-gram pipeline (hashlib sha256,
dict counts) pins every stage, plus plan/scale assertions."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.dsir import (
    dsir_fit,
    dsir_log_weights,
    dsir_sample,
    hashed_ngram_bucket,
    hashed_ngram_counts,
)
from polars_text_spark.plans.explain import explain_str

BUCKETS = 64  # small so collisions actually occur in the fixture


def _py_grams(text: str, max_n: int = 2) -> list[str]:
    toks = [t for t in text.lower().strip().split() if t]
    grams = list(toks)
    for n in range(2, max_n + 1):
        grams += [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return grams


def _py_bucket(ngram: str, buckets: int, salt: str = "") -> int:
    h = hashlib.sha256((ngram + salt).encode()).hexdigest()
    return int(h[:15], 16) % buckets


def _py_counts(texts: list[str], buckets: int) -> dict[int, int]:
    counts: dict[int, int] = {}
    for t in texts:
        for g in _py_grams(t):
            b = _py_bucket(g, buckets)
            counts[b] = counts.get(b, 0) + 1
    return counts


RAW = [
    (0, "the cat sat on the mat"),
    (1, "dogs bark loudly at night"),
    (2, "the encyclopedia describes the history of rome"),
    (3, "buy cheap pills now now now"),
    (4, "rome fell after centuries of decline"),
    (5, ""),
    (6, None),
    (7, "the   cat\tsat"),
]
TARGET = [
    (100, "the encyclopedia describes the history of rome"),
    (101, "rome fell after centuries of decline"),
    (102, "a scholarly history of the roman empire"),
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_bucket_matches_python_and_range(spark):
    grams = ["the", "cat", "the cat", "rome", "of rome", "ünïcode tökens"]
    df = spark.createDataFrame([(g,) for g in grams], "g string")
    got = {
        r["g"]: r["b"]
        for r in df.select(
            "g", hashed_ngram_bucket(F.col("g"), BUCKETS, "s").alias("b")
        ).collect()
    }
    for g in grams:
        assert got[g] == _py_bucket(g, BUCKETS, "s")
        assert 0 <= got[g] < BUCKETS


def test_hashed_ngram_counts_match_python(spark, frames):
    raw, _ = frames
    got = {
        r["bucket"]: r["cnt"]
        for r in hashed_ngram_counts(raw, buckets=BUCKETS).collect()
    }
    exp = _py_counts([t for _, t in RAW if t], BUCKETS)
    assert got == exp


def test_log_weights_match_python_reimplementation(spark, frames):
    raw, tgt = frames
    ratio = dsir_fit(raw, tgt, buckets=BUCKETS)
    got = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_log_weights(raw, ratio, buckets=BUCKETS).collect()
    }
    r_cnt = _py_counts([t for _, t in RAW if t], BUCKETS)
    t_cnt = _py_counts([t for _, t in TARGET], BUCKETS)
    r_tot, t_tot = sum(r_cnt.values()), sum(t_cnt.values())

    def lr(b: int) -> float:
        return math.log((t_cnt.get(b, 0) + 1.0) / (t_tot + BUCKETS)) - math.log(
            (r_cnt.get(b, 0) + 1.0) / (r_tot + BUCKETS)
        )

    for doc_id, text in RAW:
        grams = _py_grams(text) if text else []
        if not grams:
            assert doc_id not in got  # nothing to weigh -> absent
            continue
        n, w = got[doc_id]
        assert n == len(grams)
        assert w == pytest.approx(
            sum(lr(_py_bucket(g, BUCKETS)) for g in grams), abs=1e-9
        )


def test_target_like_docs_outweigh_junk(spark, frames):
    raw, tgt = frames
    ratio = dsir_fit(raw, tgt, buckets=4096)  # wide -> few collisions
    w = {
        r["doc_id"]: r["log_weight"] / r["n_features"]
        for r in dsir_log_weights(raw, ratio, buckets=4096).collect()
    }
    # docs 2/4 appear verbatim in the target; 1/3 share nothing with it
    assert min(w[2], w[4]) > max(w[1], w[3])


def test_fit_table_is_complete_and_finite(spark, frames):
    raw, tgt = frames
    rows = dsir_fit(raw, tgt, buckets=BUCKETS).collect()
    assert sorted(r["bucket"] for r in rows) == list(range(BUCKETS))
    assert all(math.isfinite(r["log_ratio"]) for r in rows)


def test_empty_target_still_finite(spark, frames):
    raw, _ = frames
    empty = raw.filter(F.lit(False))
    rows = dsir_fit(raw, empty, buckets=BUCKETS).collect()
    assert len(rows) == BUCKETS
    assert all(math.isfinite(r["log_ratio"]) for r in rows)


def test_sample_deterministic_and_selective(spark, frames):
    raw, tgt = frames
    ratio = dsir_fit(raw, tgt, buckets=4096)
    weights = dsir_log_weights(raw, ratio, buckets=4096)
    kept1 = sorted(
        r["doc_id"] for r in dsir_sample(raw, weights, beta=3.0).collect()
    )
    kept2 = sorted(
        r["doc_id"] for r in dsir_sample(raw, weights, beta=3.0).collect()
    )
    assert kept1 == kept2  # content-keyed: stable under reruns
    # featureless docs can never survive resampling
    assert 5 not in kept1 and 6 not in kept1
    # target-verbatim docs saturate at keep-prob 1 (positive avg ratio)
    assert 2 in kept1 and 4 in kept1


def test_scoring_join_is_broadcast_and_text_stays_out_of_shuffle(spark, frames):
    raw, tgt = frames
    ratio = dsir_fit(raw, tgt, buckets=BUCKETS)
    plan = explain_str(dsir_log_weights(raw, ratio, buckets=BUCKETS), "formatted")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the doc-id aggregation must partial-combine before its Exchange
    assert re.search(r"HashAggregate.*partial_count", plan) or "partial" in plan
    # the text column must never appear in an Exchange's output row
    for m in re.finditer(r"\(\d+\) Exchange\n(?:.+\n)+?", plan):
        assert "text" not in m.group(0)


def test_gumbel_topk_exact_size_and_determinism(spark, frames):
    from polars_text_spark.operators.dsir import dsir_topk

    raw, tgt = frames
    ratio = dsir_fit(raw, tgt, buckets=4096)
    weights = dsir_log_weights(raw, ratio, buckets=4096)
    k1 = sorted(r["doc_id"] for r in dsir_topk(raw, weights, 3).collect())
    k2 = sorted(r["doc_id"] for r in dsir_topk(raw, weights, 3).collect())
    assert len(k1) == 3 and k1 == k2
    # sharpened beta makes the target-verbatim docs (2, 4) near-certain
    sharp = sorted(
        r["doc_id"] for r in dsir_topk(raw, weights, 2, beta=50.0).collect()
    )
    assert sharp == [2, 4]
    with pytest.raises(ValueError, match="n must be"):
        dsir_topk(raw, weights, 0)


def test_gumbel_topk_matches_python_reference(spark, frames):
    from polars_text_spark.operators.dsir import dsir_topk

    raw, tgt = frames
    ratio = dsir_fit(raw, tgt, buckets=4096)
    weights = dsir_log_weights(raw, ratio, buckets=4096)
    w = {
        r["doc_id"]: r["log_weight"] / r["n_features"]
        for r in weights.collect()
    }

    def key(doc_id: int) -> float:
        h = hashlib.sha256(str(doc_id).encode()).hexdigest()
        u = max(int(h[:15], 16) / float(1 << 60), 1.0 / (1 << 60))
        return 2.0 * w[doc_id] + -math.log(-math.log(u))

    exp = sorted(w, key=lambda d: (-key(d), d))[:4]
    got = [
        r["doc_id"]
        for r in dsir_topk(raw, weights, 4, beta=2.0).collect()
    ]
    assert sorted(got) == sorted(exp)


def test_fit_weights_fused_matches_layered(spark):
    """Round-16 fused path: dsir_fit_weights(df, flag) must reproduce
    the layered dsir_fit(raw, target) + dsir_log_weights(raw, ratio)
    outputs — ratio table bit-identical, weights equal to 1e-9 (the
    fused form sums n*log_ratio per distinct (doc, bucket); summation
    order is the only difference, absorbed by the repo-wide 6-dp
    rounding contract)."""
    from polars_text_spark.operators.dsir import dsir_fit_weights

    rows = [
        (0, "en", "the cat sat on the mat"),
        (1, "de", "dogs bark loudly at night"),
        (2, "en", "the encyclopedia describes the history of rome"),
        (3, None, "buy cheap pills now now now"),
        (4, "en", "rome fell after centuries of decline"),
        (5, "en", None),
        (6, "fr", "the   cat\tsat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    target = df.filter(F.col("lang") == "en")
    ratio_layered = {
        r["bucket"]: r["log_ratio"]
        for r in dsir_fit(df, target, buckets=BUCKETS).collect()
    }
    w_layered = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_log_weights(
            df, dsir_fit(df, target, buckets=BUCKETS), buckets=BUCKETS
        ).collect()
    }
    ratio_f, weights_f = dsir_fit_weights(
        df, F.col("lang") == "en", buckets=BUCKETS
    )
    ratio_fused = {r["bucket"]: r["log_ratio"] for r in ratio_f.collect()}
    w_fused = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in weights_f.collect()
    }
    assert ratio_fused == ratio_layered
    assert set(w_fused) == set(w_layered)
    for d, (n, w) in w_layered.items():
        assert w_fused[d][0] == n
        assert abs(w_fused[d][1] - w) < 1e-9
