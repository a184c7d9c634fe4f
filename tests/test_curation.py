"""Round-7 curation operators: per-group caps, TF-IDF keywords,
cardinality sketch calibration."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_cap_per_group_caps_and_is_deterministic(spark, sf_dir):
    from polars_text_spark.operators.sampling import cap_per_group

    docs = _docs(spark, sf_dir)
    capped = cap_per_group(docs, "source", "doc_id", max_rows=10)
    sizes = capped.groupBy("source").count().collect()
    assert sizes and all(r["count"] <= 10 for r in sizes)
    # groups smaller than the cap are untouched
    orig = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    got = {r["source"]: r["count"] for r in sizes}
    for s, n in orig.items():
        assert got.get(s, 0) == min(n, 10)
    # survivor SET is partitioning-independent
    a = {r["doc_id"] for r in capped.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in cap_per_group(
            docs.repartition(7), "source", "doc_id", max_rows=10
        ).select("doc_id").collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        cap_per_group(docs, "source", "doc_id", max_rows=0)


def test_cap_per_group_salt_changes_survivors(spark, sf_dir):
    from polars_text_spark.operators.sampling import cap_per_group

    docs = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in cap_per_group(docs, "source", "doc_id", max_rows=5).collect()}
    b = {r["doc_id"] for r in cap_per_group(docs, "source", "doc_id", max_rows=5, salt="x").collect()}
    assert a != b  # different draw, same sizes


def test_tfidf_keywords_hand_computed(spark):
    from polars_text_spark.operators.search import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_keywords(docs, "text", "doc_id", k=2)
    rows = {(r["doc_id"], r["term"]): r for r in out.collect()}
    n = 3.0

    def tfidf(tf, df):
        return round(tf * (math.log((n + 1) / (df + 1)) + 1), 6)

    # doc 0: apple tf=2 df=1, banana tf=1 df=2
    assert rows[(0, "apple")]["tfidf"] == pytest.approx(tfidf(2, 1))
    assert rows[(0, "apple")]["rank"] == 1
    assert rows[(0, "banana")]["tfidf"] == pytest.approx(tfidf(1, 2))
    assert rows[(0, "banana")]["rank"] == 2
    # doc 2: single term, rank 1, k bound respected
    assert rows[(2, "cherry")]["rank"] == 1
    assert all(r["rank"] <= 2 for r in rows.values())


def test_tfidf_keywords_min_df_and_ties(spark):
    from polars_text_spark.operators.search import tfidf_keywords

    docs = spark.createDataFrame(
        [(0, "zz aa"), (1, "keep keep")], "doc_id int, text string"
    )
    out = tfidf_keywords(docs, "text", "doc_id", k=5, min_df=2)
    # every term has df=1 -> all filtered
    assert out.count() == 0
    out2 = {
        (r["doc_id"], r["rank"]): r["term"]
        for r in tfidf_keywords(docs, "text", "doc_id", k=5).collect()
    }
    # doc 0: identical scores -> tie broken alphabetically
    assert out2[(0, 1)] == "aa" and out2[(0, 2)] == "zz"


def test_cardinality_report_exact_and_sketch(spark):
    from polars_text_spark.operators.quality import cardinality_report

    rows = [(i, f"g{i % 2}", f"k{i % 50}") for i in range(400)]
    df = spark.createDataFrame(rows, "id int, g string, k string")
    out = {r["g"]: r for r in cardinality_report(df, "g", "k").collect()}
    assert out["g0"]["n_rows"] == 200 and out["g1"]["n_rows"] == 200
    # g0 holds even k's (25 distinct), g1 odd (25 distinct)
    assert out["g0"]["n_distinct"] == 25 and out["g1"]["n_distinct"] == 25
    assert out["g0"]["sketch_ok"] and out["g1"]["sketch_ok"]


def test_cardinality_report_single_aggregate_plan(spark, sf_dir):
    from polars_text_spark.operators.quality import cardinality_report

    docs = _docs(spark, sf_dir)
    out = cardinality_report(docs, "source", F.sha2(F.col("text"), 256))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one logical aggregate: no join of separately-computed branches
    assert "Join" not in plan


def test_embedding_contamination_hand_cases(spark):
    from polars_text_spark.operators.decontam import embedding_contamination

    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),   # parallel to eval -> 1.0
            (2, [0.9, 0.1]),   # near-parallel
            (3, [0.0, 1.0]),   # orthogonal
            (4, None),         # no vector -> absent
        ],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(10, [2.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {
        r.vec_id: r
        for r in embedding_contamination(train, ev, threshold=0.95).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1].contaminated and got[2].contaminated
    assert not got[3].contaminated
    assert got[1].max_eval_cosine == pytest.approx(1.0)
    # empty eval set: every row kept, nothing contaminated, null max
    empty = ev.filter("vec_id < 0")
    kept = {
        r.vec_id: r for r in embedding_contamination(train, empty).collect()
    }
    assert set(kept) == {1, 2, 3}
    assert all(not r.contaminated and r.max_eval_cosine is None
               for r in kept.values())


def test_embedding_contamination_scores_in_one_scan_pass(spark):
    """The eval side rides in the Arrow scorer's closure, so the plan
    must contain NO pairwise join of any kind — the dense (train x
    eval) scoring happens inside one mapInPandas pass over the train
    scan, and the only join left is the N-row max join-back. A
    BroadcastNestedLoopJoin/CartesianProduct reappearing here means
    the O(N x E) pair frame is being materialized as rows again."""
    from polars_text_spark.operators.decontam import embedding_contamination
    from polars_text_spark.plans import explain_str

    train = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    ev = train.limit(2)
    plan = explain_str(embedding_contamination(train, ev), "formatted")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    # raises rather than collecting an unbounded eval side
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exceeds 1 rows"):
        embedding_contamination(train, ev, max_eval_rows=1)
