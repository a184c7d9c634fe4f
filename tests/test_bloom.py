"""Broadcast Bloom-bitset prefilter (operators/bloom.py).

Pins the two properties that make the Bloom SAFE to put in front of
an exact join: zero false negatives (fit and probe share one
bit-index expression) and a realized false-positive rate near the
sized ``fpp``; plus the composition law — Bloom-prefiltered operators
return bit-identical results to their plain-join twins.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from polars_text_spark.operators.bloom import (
    bloom_fit,
    bloom_might_contain,
    bloom_params,
    bloom_semi_join,
)
from polars_text_spark.plans import explain_str


def test_bloom_params_sizing():
    m, k = bloom_params(1000, 0.01)
    # textbook: ~9.6 bits/item and ~7 hashes at 1%
    assert 9 * 1000 <= m <= 11 * 1000 and m % 64 == 0
    assert 6 <= k <= 8
    # degenerate inputs stay valid
    assert bloom_params(0, 0.01) == (64, 1)
    m2, k2 = bloom_params(10, 0.5)
    assert m2 % 64 == 0 and 1 <= k2 <= 16


def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    keys = spark.createDataFrame(
        [(f"member-{i:05d}",) for i in range(2000)], ["k"]
    )
    m, k = bloom_params(2000, 0.01)
    bl = bloom_fit(keys, "k", m_bits=m, n_hashes=k)
    probe = spark.createDataFrame(
        [(f"member-{i:05d}",) for i in range(2000)]
        + [(f"absent-{i:05d}",) for i in range(2000)],
        ["v"],
    )
    hits = {
        r["v"]: r["hit"]
        for r in bloom_might_contain(probe, "v", bl, out_col="hit").collect()
    }
    misses = [i for i in range(2000) if not hits[f"member-{i:05d}"]]
    assert misses == [], "Bloom false negative — fit/probe hashing diverged"
    fp = sum(1 for i in range(2000) if hits[f"absent-{i:05d}"])
    # sized for 1%; allow generous slack for hash variance
    assert fp / 2000 < 0.05


def test_bloom_meta_travels_with_bits(spark):
    """Probe parameters come from the filter frame itself — a fit
    with unusual (m, k, seed) must probe correctly with no parameters
    repeated at the call site."""
    keys = spark.createDataFrame([(f"x{i}",) for i in range(50)], ["k"])
    bl = bloom_fit(keys, "k", m_bits=1024, n_hashes=3, seed=99)
    got = bloom_might_contain(keys.withColumnRenamed("k", "v"), "v", bl)
    assert all(r["might_contain"] for r in got.collect())


def test_bloom_semi_join_exact(spark):
    big = spark.createDataFrame([(i, f"u{i % 700}") for i in range(3000)], ["i", "u"])
    keys = spark.createDataFrame([(f"u{i}",) for i in range(0, 700, 3)], ["ku"])
    got = sorted(
        map(tuple, bloom_semi_join(big, "u", keys, "ku").collect())
    )
    want = sorted(
        map(tuple, big.join(keys, big["u"] == keys["ku"], "left_semi").collect())
    )
    assert got == want and len(got) > 0


def test_bloom_contamination_matches_plain(spark, sf_dir):
    from polars_text_spark.operators.decontam import (
        bloom_ngram_contamination,
        ngram_contamination,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    cand = docs.filter(F.col("doc_id") % 7 != 0)
    plain = sorted(map(tuple, ngram_contamination(cand, bench).collect()))
    bloomed = sorted(
        map(tuple, bloom_ngram_contamination(cand, bench).collect())
    )
    assert bloomed == plain and len(plain) > 0


def test_bloom_probe_is_join_free_map_side(spark):
    """The probe must add NO join and NO shuffle: the bitset is an
    array Literal referenced once per task, and every bit test
    evaluates in the scan's projection. A Join node here means the
    bitset regressed to a row-carried payload — which memcpys the
    whole bitset into every probed row (the measured 10 GB-of-copies
    failure mode documented in operators/bloom.py)."""
    df = spark.range(100).select(F.concat(F.lit("v"), "id").alias("v"))
    keys = spark.range(10).select(F.concat(F.lit("v"), "id").alias("k"))
    bl = bloom_fit(keys, "k", m_bits=1024, n_hashes=4)
    plan = explain_str(bloom_might_contain(df, "v", bl), "formatted")
    bad = [
        l
        for l in plan.splitlines()
        if re.search(r"\bExchange\b|Join", l)
    ]
    assert bad == [], f"probe plan must be join/shuffle-free: {bad}"


def test_bloom_empty_key_set(spark):
    """An empty reference set must yield an empty (not crashing)
    semi join: the all-zero bitset's words fit 32 bits, and an
    uncast lit() literal would come out array<int>, blowing up
    getbit on positions >= 32."""
    big = spark.range(50).select(F.concat(F.lit("v"), "id").alias("v"))
    empty = spark.createDataFrame([], "ku string")
    assert bloom_semi_join(big, "v", empty, "ku").count() == 0


def test_bloom_store_lifecycle(spark):
    """write + append must be bit-identical to one fit over the
    union (bit_or merge is exact), parameters must come from the
    store meta, and probes through the merged read must keep the
    zero-false-negative guarantee for BOTH generations."""
    from polars_text_spark.operators.bloom import (
        append_bloom_shard,
        read_bloom_store,
        write_bloom_store,
    )

    base = spark.createDataFrame([(f"seen-{i}",) for i in range(300)], ["k"])
    shard = spark.createDataFrame(
        [(f"seen-{i}",) for i in range(300, 400)]
        + [("seen-5",)],  # overlap: appends have no disjointness contract
        ["k"],
    )
    write_bloom_store(base, "k", "bloomstore_t", m_bits=4096, n_hashes=5)
    append_bloom_shard(shard, "k", "bloomstore_t")
    merged = read_bloom_store(spark, "bloomstore_t")
    direct = bloom_fit(
        base.unionByName(shard), "k", m_bits=4096, n_hashes=5
    )
    assert merged.first()[0] == direct.first()[0]  # bit-identical
    probe = spark.createDataFrame(
        [(f"seen-{i}",) for i in range(400)]
        + [(f"never-{i}",) for i in range(100)],
        ["v"],
    )
    hits = {
        r["v"]: r["might_contain"]
        for r in bloom_might_contain(probe, "v", merged).collect()
    }
    assert all(hits[f"seen-{i}"] for i in range(400))
    # sized generously (4096 bits / 401 keys): most absentees clear
    assert sum(hits[f"never-{i}"] for i in range(100)) < 20
