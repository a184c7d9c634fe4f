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


# ---------------------------------------------------------------------------
# integer perceptron training (operators/classifier.py)
# ---------------------------------------------------------------------------


def _toy(spark):
    pos = spark.createDataFrame(
        [(i, f"alpha beta shared{i % 3} alpha") for i in range(40)],
        ["doc_id", "text"],
    )
    neg = spark.createDataFrame(
        [(1000 + i, f"gamma delta shared{i % 3} gamma") for i in range(40)],
        ["doc_id", "text"],
    )
    return pos, neg


def test_perceptron_separates_toy_corpus(spark):
    from polars_text_spark.operators.classifier import (
        integer_classifier_margins,
        train_hashed_perceptron,
    )

    pos, neg = _toy(spark)
    w = train_hashed_perceptron(pos, neg, rounds=2)
    res = {
        r.doc_id: (r.margin, r.keep)
        for r in integer_classifier_margins(pos.unionByName(neg), w).collect()
    }
    assert all(res[i][1] for i in range(40))
    assert not any(res[1000 + i][1] for i in range(40))
    # keep is exactly margin > 0
    assert all((m > 0) == k for m, k in res.values())


def test_perceptron_weights_partition_independent(spark):
    """Integer sums are exactly associative/commutative — the trained
    weights must be bit-identical however the input is partitioned
    (the float-gradient failure mode this design exists to avoid)."""
    from polars_text_spark.operators.classifier import train_hashed_perceptron

    pos, neg = _toy(spark)
    a = sorted(map(tuple, train_hashed_perceptron(pos, neg).collect()))
    b = sorted(
        map(
            tuple,
            train_hashed_perceptron(
                pos.repartition(7), neg.repartition(3)
            ).collect(),
        )
    )
    assert a == b and a


def test_perceptron_rejects_empty_training_set(spark):
    import pytest as _pytest

    from polars_text_spark.operators.classifier import train_hashed_perceptron

    empty = spark.createDataFrame([], "doc_id long, text string")
    blank = spark.createDataFrame([(1, "   ")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        train_hashed_perceptron(empty, blank)


def test_margins_drop_tokenless_docs(spark):
    from polars_text_spark.operators.classifier import (
        integer_classifier_margins,
        train_hashed_perceptron,
    )

    pos, neg = _toy(spark)
    w = train_hashed_perceptron(pos, neg)
    scored = integer_classifier_margins(
        spark.createDataFrame(
            [(1, "alpha beta"), (2, ""), (3, None)], ["doc_id", "text"]
        ),
        w,
    )
    assert [r.doc_id for r in scored.collect()] == [1]


def test_trained_weights_deploy_into_float_scorer(spark):
    """The train -> deploy bridge: integer weights densified via
    trained_float_weights must drive hashed_classifier_score to the
    same separation on the toy corpus — training here, scoring with
    the map-only literal-weights plan there."""
    from pyspark.sql import functions as F

    from polars_text_spark.functions.analysis import hashed_classifier_score
    from polars_text_spark.operators.classifier import (
        train_hashed_perceptron,
        trained_float_weights,
    )

    pos, neg = _toy(spark)
    w = train_hashed_perceptron(pos, neg, rounds=2)
    vec = trained_float_weights(w)
    assert len(vec) == 4096 and any(v != 0.0 for v in vec)
    scored = (
        pos.unionByName(neg)
        .select(
            "doc_id",
            # threshold=1e-6 preserves the integer gate's
            # reject-on-zero-evidence semantics (see
            # trained_float_weights docstring)
            hashed_classifier_score(
                "text", weights=vec, threshold=1e-6
            ).alias("s"),
        )
        .select("doc_id", F.col("s.keep").alias("keep"))
    )
    res = {r.doc_id: r.keep for r in scored.collect()}
    assert all(res[i] for i in range(40))
    assert not any(res[1000 + i] for i in range(40))


def test_trainer_rejects_overlapping_ids_and_bad_rounds(spark):
    import pytest as _pytest

    from polars_text_spark.operators.classifier import (
        train_hashed_perceptron,
        trained_float_weights,
    )

    pos, neg = _toy(spark)
    overlap = neg.withColumn("doc_id", F.col("doc_id") - 1000)  # ids collide
    with _pytest.raises(ValueError, match="unique"):
        train_hashed_perceptron(pos, overlap)
    with _pytest.raises(ValueError, match="rounds"):
        train_hashed_perceptron(pos, neg, rounds=0)
    # bucket-count mismatch at densify time fails loudly
    w = train_hashed_perceptron(pos, neg, n_buckets=4096)
    with _pytest.raises(ValueError, match="bucket"):
        trained_float_weights(w, n_buckets=4)
