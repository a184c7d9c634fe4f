"""Round-7 batch 5: Heaps'-law fit (two-phase cumsum) and GK quantile
sketch audit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.quality import (
    heaps_law_fit,
    quantile_sketch_audit,
)


def test_heaps_fit_exact_power_law(spark):
    # Construct docs so cum_types = cum_tokens exactly (every token new):
    # beta must fit 1.0, intercept 0.0.
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(i + 1))) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_law_fit(df).collect()[0]
    assert r["n_docs"] == 5
    assert r["beta"] == pytest.approx(1.0, abs=1e-6)
    assert r["log2_k"] == pytest.approx(0.0, abs=1e-6)


def test_heaps_fit_bucketed_cumsum_matches_small_bucket(spark, sf_dir):
    """The two-phase bucketed cumsum must be invariant to bucket_size."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = heaps_law_fit(docs, bucket_size=1024).collect()[0]
    b = heaps_law_fit(docs, bucket_size=7).collect()[0]
    assert (a["n_docs"], a["beta"], a["log2_k"]) == (
        b["n_docs"],
        b["beta"],
        b["log2_k"],
    )
    # natural-ish corpus: 0 < beta < 1
    assert 0.0 < a["beta"] < 1.0
    with pytest.raises(ValueError):
        heaps_law_fit(docs, bucket_size=0)


def test_quantile_sketch_audit_bounds_hold(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("n_chars").isNotNull()
    )
    rows = quantile_sketch_audit(docs, "source", "n_chars", accuracy=1000).collect()
    assert rows
    for r in rows:
        assert r["gk_p50_ok"] and r["gk_p90_ok"]
        assert r["p50_exact"] <= r["p90_exact"]
    with pytest.raises(ValueError):
        quantile_sketch_audit(docs, "source", "n_chars", accuracy=0)


def test_quantile_sketch_audit_tiny_group_exact(spark):
    # accuracy >> n: GK returns exact ranks; bounds trivially hold
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], "source string, v double"
    )
    r = quantile_sketch_audit(df, "source", "v", accuracy=10000).collect()[0]
    assert r["n_rows"] == 100
    assert r["gk_p50_ok"] and r["gk_p90_ok"]
    # exact interpolated quantiles of 1..100
    assert r["p50_exact"] == pytest.approx(50.5)
    assert r["p90_exact"] == pytest.approx(90.1)
