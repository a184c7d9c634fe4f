"""Fixed-point PageRank (operators/graph.py): hand-verifiable
topologies, exact-integer invariants, input hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.graph import pagerank
from polars_text_spark.operators.web import domain_link_edges

SCALE = 10**9


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_star_hub_dominates(spark):
    # a,b,c all point at hub; hub is dangling
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("c", "hub")])
    r = _ranks(pagerank(e, iterations=3))
    assert set(r) == {"a", "b", "c", "hub"}
    assert r["a"] == r["b"] == r["c"]
    assert r["hub"] > r["a"]


def test_one_iteration_hand_case(spark):
    # a -> b, both start at SCALE. After one round:
    #   b is NOT dangling-free: only b dangles (no out-edge).
    #   share(a) = SCALE div 1 = SCALE; dang = rank(b) = SCALE
    #   dang_share = SCALE div 2
    #   rank'(b) = (15*SCALE + 85*(SCALE + SCALE div 2)) div 100
    #   rank'(a) = (15*SCALE + 85*(0     + SCALE div 2)) div 100
    e = _edges(spark, [("a", "b")])
    r = _ranks(pagerank(e, iterations=1))
    dang_share = SCALE // 2
    assert r["b"] == (15 * SCALE + 85 * (SCALE + dang_share)) // 100
    assert r["a"] == (15 * SCALE + 85 * dang_share) // 100


def test_mass_conserved_within_truncation(spark):
    # total mass n*SCALE is invariant up to the integer-division
    # truncation (< 1 unit lost per share/teleport term per node)
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
    )
    out = pagerank(e, iterations=4)
    n = out.count()
    total = out.agg(F.sum("rank")).collect()[0][0]
    assert n * SCALE - total < n * 200  # tiny truncation loss only
    assert total <= n * SCALE


def test_cycle_is_uniform(spark):
    # a symmetric cycle must stay exactly uniform (and exactly equal
    # across nodes — integer math has no order noise to blur it)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    r = _ranks(pagerank(e, iterations=5))
    assert len(set(r.values())) == 1


def test_multi_edges_and_self_loops_collapse(spark):
    base = _edges(spark, [("a", "b"), ("b", "a")])
    noisy = _edges(
        spark,
        [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a"), ("b", "b")],
    )
    assert _ranks(pagerank(base, iterations=3)) == _ranks(
        pagerank(noisy, iterations=3)
    )


def test_determinism_across_partitionings(spark):
    pairs = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(60)]
    a = _ranks(pagerank(_edges(spark, pairs), iterations=3))
    b = _ranks(
        pagerank(_edges(spark, pairs).repartition(13), iterations=3)
    )
    assert a == b


def test_input_validation(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(e, damping_pct=100)
    with pytest.raises(ValueError, match="scale"):
        pagerank(e, scale=0)


def test_overflow_guard(spark):
    e = _edges(spark, [("a", "b"), ("b", "c")])
    with pytest.raises(ValueError, match="overflow"):
        pagerank(e, scale=2**62)


def test_empty_graph(spark):
    e = _edges(spark, []).filter(F.lit(False))
    assert pagerank(e, iterations=2).count() == 0


def test_domain_link_edges_shape(spark):
    df = spark.createDataFrame(
        [
            ("A.com", "x https://b.com/1 y https://b.com/2 z http://A.COM/self"),
            ("a.com", "see https://c.com/"),
            ("d.com", None),
            (None, "https://e.com/"),
        ],
        "domain string, text string",
    )
    got = {
        (r["src"], r["dst"])
        for r in domain_link_edges(df, "domain", "text").collect()
    }
    # duplicate b.com edges collapse; self-link (a.com -> a.com after
    # lower-fold) dropped; null text / null domain rows dropped
    assert got == {("a.com", "b.com"), ("a.com", "c.com")}
