"""Regression tests for the round-7 self-review findings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.quality import heaps_law_fit
from polars_text_spark.operators.sampling import cap_per_group
from polars_text_spark.operators.splits import assign_splits, split_leakage


def test_cap_per_group_rejects_staging_collision(spark):
    df = spark.createDataFrame(
        [("s", 1, 9)], "source string, doc_id long, __cap_rn long"
    )
    with pytest.raises(ValueError, match="__cap_rn"):
        cap_per_group(df, "source", "doc_id", max_rows=1)


def test_split_leakage_keeps_null_split_rows(spark):
    df = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, None)], "doc_id long, split string"
    )
    pairs = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    got = {r["doc_id"]: r for r in split_leakage(df, pairs).collect()}
    # row 3 has a NULL split: non-train, must appear — and its family
    # contains train row 1, so it is contaminated
    assert set(got) == {2, 3}
    assert got[3]["contaminated"] is True
    assert got[3]["split"] is None
    assert got[2]["contaminated"] is False


def test_assign_splits_raises_on_null_key(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([("a",), (None,)], "k string")
    out = assign_splits(df, "k", {"val": 0.5, "train": 0.5})
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)) as e:
        out.collect()
    assert "null hash key" in str(e.value)


def test_assign_splits_still_works_without_nulls(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    out = assign_splits(df, "k", {"val": 0.2, "train": 0.8}).collect()
    labels = {r["split"] for r in out}
    assert labels <= {"val", "train"} and "train" in labels


def test_heaps_law_fit_rejects_string_id(spark):
    df = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    with pytest.raises(TypeError, match="numeric"):
        heaps_law_fit(df)


def test_ngram_definitions_shared(spark):
    """ngram_counts and doc_ngram_novelty must agree on the gram set."""
    from polars_text_spark.operators.linguistics import ngram_counts
    from polars_text_spark.operators.quality import doc_ngram_novelty

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    n_gram_rows = ngram_counts(df, n=3).count()
    novelty = doc_ngram_novelty(df, n=3).collect()[0]
    assert novelty["n_grams"] == n_gram_rows == 2
