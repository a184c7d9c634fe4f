"""Unit tests for the hashing-trick linear quality classifier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import hashed_classifier_score
from polars_text_spark.operators.dedup import sha_token_hash


def _bucket_of(spark, token: str, n_buckets: int = 4096) -> int:
    row = spark.range(1).select(
        (sha_token_hash(F.lit(f"b:{token}")) % n_buckets).alias("b")
    ).first()
    return int(row["b"])


def _score(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id", hashed_classifier_score("text", **kw).alias("s")
    ).collect()
    return {r["doc_id"]: (r["s"]["margin"], r["s"]["keep"]) for r in out}


def test_explicit_weights_classify(spark):
    # craft a weight vector where "good"-bucket weight is +1 and
    # "bad"-bucket weight is -1
    bg = _bucket_of(spark, "good")
    bb = _bucket_of(spark, "bad")
    w = [0.0] * 4096
    w[bg] = 1.0
    w[bb] = -1.0
    got = _score(
        spark,
        [(1, "good good good"), (2, "bad bad"), (3, "good bad")],
        weights=w,
    )
    assert got[1] == (1.0, True)
    assert got[2] == (-1.0, False)
    # mean of +1 and -1 with possible 0-weight fillers: exactly 0
    assert got[3][0] == 0.0 and got[3][1] is True


def test_threshold_and_bias(spark):
    bg = _bucket_of(spark, "meh")
    w = [0.0] * 4096
    w[bg] = 0.5
    got = _score(spark, [(1, "meh")], weights=w, threshold=0.6)
    assert got[1] == (0.5, False)
    got = _score(spark, [(1, "meh")], weights=w, bias=0.2, threshold=0.6)
    assert got[1][0] == pytest.approx(0.7) and got[1][1] is True


def test_empty_and_null_never_keep(spark):
    got = _score(spark, [(1, ""), (2, None), (3, "   ")])
    for d in (1, 2, 3):
        assert got[d] == (0.0, False)


def test_pseudo_weights_bounded_and_deterministic(spark):
    rows = [(i, f"tok{i} alpha beta gamma") for i in range(20)]
    a = _score(spark, rows)
    b = _score(spark, rows)
    assert a == b
    for m, _ in a.values():
        assert -1.0 <= m <= 1.0


def test_weights_length_validated(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        df.select(hashed_classifier_score("text", weights=[0.1, 0.2]))
