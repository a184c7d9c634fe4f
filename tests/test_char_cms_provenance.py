"""Round-7 batch 2: char-level quality stats, CMS heavy-hitters audit,
near-dup source provenance matrix."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import char_class_ratios, char_entropy
from polars_text_spark.operators.dedup import near_dup_source_matrix
from polars_text_spark.operators.quality import heavy_hitters_audit


def _texts(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "text string")


def test_char_entropy_hand_computed(spark):
    df = _texts(spark, ["aabb", "aaaa", "", None, "ab"])
    got = [
        r["e"]
        for r in df.select(char_entropy("text").alias("e")).collect()
    ]
    assert got[0] == pytest.approx(1.0, abs=1e-12)  # two symbols 50/50
    assert got[1] == 0.0 and not math.copysign(1, got[1]) < 0  # not -0.0
    assert got[2] == 0.0
    assert got[3] is None
    assert got[4] == pytest.approx(1.0, abs=1e-12)


def test_char_class_ratios(spark):
    df = _texts(spark, ["AB 12", ""])
    r = df.select(char_class_ratios("text").alias("r")).collect()
    row = r[0]["r"]
    assert row["n_chars"] == 5
    assert row["digit_ratio"] == pytest.approx(0.4)
    assert row["upper_ratio"] == pytest.approx(0.4)
    assert row["space_ratio"] == pytest.approx(0.2)
    empty = r[1]["r"]
    assert empty["n_chars"] == 0 and empty["digit_ratio"] == 0.0


def test_heavy_hitters_cms_never_underestimates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = heavy_hitters_audit(docs, "text", k=10, depth=4, width=64).collect()
    assert len(out) == 10
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, 11))
    for r in out:
        assert r["cms_est"] >= r["exact_count"]  # CMS guarantee
    # ranks ordered by exact count desc
    by_rank = sorted(out, key=lambda r: r["rank"])
    counts = [r["exact_count"] for r in by_rank]
    assert counts == sorted(counts, reverse=True)


def test_heavy_hitters_wide_sketch_is_exact_on_tiny_vocab(spark):
    df = _texts(spark, ["a a a b b c"])
    out = heavy_hitters_audit(df, "text", k=3, depth=4, width=4096).collect()
    got = {r["token"]: (r["exact_count"], r["cms_est"]) for r in out}
    # vocab of 3 in 4096 buckets: collision-free, est == exact
    assert got == {"a": (3, 3), "b": (2, 2), "c": (1, 1)}
    with pytest.raises(ValueError):
        heavy_hitters_audit(df, "text", k=0)


def test_near_dup_source_matrix_hand_built(spark):
    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (1, base, "web"),
        (2, base + "extra", "web"),        # near-dup of 1, same source
        (3, base + "other tail", "books"),  # near-dup of 1/2, cross source
        (4, "completely different text entirely unrelated content", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = near_dup_source_matrix(
        df, "text", "doc_id", "source", jaccard_threshold=0.5
    ).collect()
    got = {(r["source_a"], r["source_b"]): r["pair_count"] for r in out}
    assert got[("web", "web")] == 1
    assert got[("books", "web")] == 2  # canonicalized least/greatest
    for r in out:
        assert 0.5 <= r["min_jaccard"] <= r["max_jaccard"] <= 1.0
