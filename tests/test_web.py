"""URL / link-density / domain-frequency operators (operators/web.py)
— the C4/Gopher-style link-spam gate and the domain table feeding
domain_cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.web import (
    domain_frequencies,
    extract_urls,
    link_stats,
    url_domains,
)
from polars_text_spark.plans import explain_str


def test_extract_and_domains_hand_cases(spark):
    rows = {
        r.i: r
        for r in spark.createDataFrame(
            [
                (1, "see https://a.example.com/x and http://B.org/y?z=1."),
                (2, "no links here"),
                (3, None),
                (4, "(https://c.net/p) trailing https://d.io"),
            ],
            "i int, t string",
        )
        .select("i", extract_urls("t"), url_domains("t"))
        .collect()
    }
    # closing paren/bracket/quote terminate a URL; trailing '.' does not
    assert rows[1].urls == [
        "https://a.example.com/x",
        "http://B.org/y?z=1.",
    ]
    assert rows[1].url_domains == ["a.example.com", "b.org"]
    assert rows[2].urls == [] and rows[2].url_domains == []
    assert rows[3].urls is None and rows[3].url_domains is None
    assert rows[4].urls == ["https://c.net/p", "https://d.io"]


def test_link_stats_hand_computed(spark):
    (row,) = (
        spark.createDataFrame([(1, "ab https://x.io cd")], "i int, t string")
        .select(link_stats("t").alias("s"))
        .collect()
    )
    s = row.s
    assert s.n_chars == 18
    assert s.n_urls == 1
    assert s.url_chars == len("https://x.io")
    assert s.link_density == pytest.approx(12 / 18)
    (empty,) = (
        spark.createDataFrame([(1, "")], "i int, t string")
        .select(link_stats("t").alias("s"))
        .collect()
    )
    assert empty.s.link_density == 0.0 and empty.s.n_urls == 0


def test_link_stats_is_map_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = explain_str(docs.select("doc_id", link_stats("text")))
    assert "Exchange" not in plan


def test_domain_frequencies_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/1 https://a.com/2 https://b.com"),
            (2, "https://a.com/3"),
            (3, None),
        ],
        "doc_id int, text string",
    )
    got = {
        r.domain: (r.n_urls, r.n_docs)
        for r in domain_frequencies(df).collect()
    }
    assert got == {"a.com": (3, 2), "b.com": (1, 1)}
