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


def test_canonicalize_url_hand_cases(spark):
    from polars_text_spark.operators.web import canonicalize_url

    df = spark.createDataFrame(
        [
            (1, "https://Ex.COM:443/p?utm_source=x&id=1#frag"),
            (2, "http://HOST.net:80/"),
            (3, "http://host.net:8080/a?gclid=z"),  # non-default port kept
            (4, "https://a.com"),  # empty path -> '/'
            (5, "https://a.com/?x=1&utm_campaign=c&y=2"),  # order kept
            (6, "https://a.com/CaseSensitive/Path?Q=V"),  # path case kept
            (7, "not a url"),  # pass-through
            (8, None),
        ],
        "i long, u string",
    )
    got = {r.i: r.c for r in df.select("i", canonicalize_url("u").alias("c")).collect()}
    assert got[1] == "https://ex.com/p?id=1"
    assert got[2] == "http://host.net/"
    assert got[3] == "http://host.net:8080/a"
    assert got[4] == "https://a.com/"
    assert got[5] == "https://a.com/?x=1&y=2"
    assert got[6] == "https://a.com/CaseSensitive/Path?Q=V"
    assert got[7] == "not a url"
    assert got[8] is None


def test_canonical_url_frequencies_collapses_variants(spark):
    from polars_text_spark.operators.web import canonical_url_frequencies

    df = spark.createDataFrame(
        [
            (1, "see https://A.com/p?utm_source=t and https://a.com:443/p"),
            (2, "ref https://a.com/p#top"),
            (3, "other https://b.com/q"),
        ],
        "doc_id int, text string",
    )
    got = {
        r.url: (r.n_urls, r.n_docs)
        for r in canonical_url_frequencies(df).collect()
    }
    # three byte-different spellings of the same resource collapse
    assert got["https://a.com/p"] == (3, 2)
    assert got["https://b.com/q"] == (1, 1)


def test_domain_suffixes_label_aligned(spark):
    from polars_text_spark.operators.web import domain_suffixes

    df = spark.createDataFrame(
        [("a.B.Example.com",), ("notexample.biz",), (None,)],
        "d string",
    )
    got = [r[0] for r in df.select(domain_suffixes("d")).collect()]
    assert got[0] == [
        "a.b.example.com", "b.example.com", "example.com", "com",
    ]
    # label alignment: 'example.biz' is NOT a suffix of notexample.biz
    assert got[1] == ["notexample.biz", "biz"]
    assert got[2] is None


def _bl_fixture(spark):
    from polars_text_spark.operators.web import blocklist_verdict

    df = spark.createDataFrame(
        [
            (1, "Sub.Example.COM"),   # blocked via parent + case fold
            (2, "example.com"),       # blocked exactly
            (3, "notexample.com"),    # label misalignment -> kept
            (4, "other.org"),         # kept
            (5, "a.b.ads.net"),       # blocked via deep parent
        ],
        "doc_id int, domain string",
    )
    bl = spark.createDataFrame(
        [("Example.COM",), ("ads.net",)], "pattern string"
    )
    return df, blocklist_verdict(df, bl)


def test_blocklist_verdict_semantics(spark):
    df, out = _bl_fixture(spark)
    got = {r.doc_id: r.blocked for r in out.collect()}
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True}
    # row multiplicity preserved (a domain matching SEVERAL patterns
    # must not duplicate): sub.example.com also matches nothing else,
    # so simply pin the total
    assert out.count() == df.count()


def test_blocklist_verdict_multi_match_no_duplication(spark):
    from polars_text_spark.operators.web import blocklist_verdict

    df = spark.createDataFrame(
        [(1, "a.b.example.com")], "doc_id int, domain string"
    )
    bl = spark.createDataFrame(
        [("b.example.com",), ("example.com",), ("com",)],
        "pattern string",
    )
    out = blocklist_verdict(df, bl)
    assert out.count() == 1 and out.collect()[0].blocked


def test_blocklist_joins_are_broadcast(spark):
    import re

    _, out = _bl_fixture(spark)
    plan = explain_str(out)
    # both the pattern probe and the matched-id rejoin must build
    # broadcast sides: the corpus never shuffles on its own keys
    # (formatted explain prints each node twice — tree + detail —
    # so count the numbered detail headers)
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert "SortMergeJoin" not in plan
