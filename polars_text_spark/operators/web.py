"""Web-corpus link signals: URL extraction, link density, domain
frequencies.

The standard link-spam / boilerplate gate of web-scale curation
pipelines (C4 and Gopher both filter on page link characteristics, and
the per-domain frequency table is the direct input to
:func:`polars_text_spark.operators.sampling.domain_cap`). Everything
is pure Catalyst regexp built-ins — map-only per-document signals
fused into the scan, one explode + one groupBy shuffle for the corpus
domain table, no UDF anywhere.

Engine portability: the URL pattern deliberately avoids backreferences
and lookarounds so the identical pattern runs under Java regex (Spark)
and RE2 (DuckDB) — the oracle queries in
:mod:`polars_text_spark.queries` build their SQL from THESE constants,
so the two engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DOMAIN_PATTERN",
    "TRACKING_PARAM_PATTERN",
    "URL_PATTERN",
    "blocklist_verdict",
    "canonical_url_frequencies",
    "canonicalize_url",
    "domain_frequencies",
    "domain_link_edges",
    "domain_suffixes",
    "extract_urls",
    "link_stats",
    "url_domains",
]

# scheme + everything to the next whitespace/bracket/quote — the
# pragmatic web-text URL shape (trailing punctuation is NOT trimmed;
# both engines see the same bytes so the oracle replays exactly)
URL_PATTERN = "https?://[^\\s<>\"')\\]}]+"
# capture group 1 = the host part of a matched URL
DOMAIN_PATTERN = "^https?://([^/:?#]+)"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def extract_urls(col: Column | str) -> Column:
    """All URL matches in a text column as ``array<string>`` —
    map-only ``regexp_extract_all``. Null in, null out; no-match is
    an empty array."""
    return F.regexp_extract_all(_col(col), F.lit(URL_PATTERN), 0).alias(
        "urls"
    )


def url_domains(col: Column | str) -> Column:
    """Lower-cased host of every URL in the text, as
    ``array<string>`` (order preserved, duplicates kept — the
    per-document domain mention stream)."""
    return F.transform(
        extract_urls(col),
        lambda u: F.lower(F.regexp_extract(u, DOMAIN_PATTERN, 1)),
    ).alias("url_domains")


def link_stats(col: Column | str) -> Column:
    """Per-document link signals as a struct ``(n_chars, n_urls,
    url_chars, link_density)`` — ``link_density`` is the fraction of
    the document's characters inside URLs, the classic link-farm /
    navigation-boilerplate gate. Pure Catalyst (regexp + higher-order
    aggregate), map-only. Null text -> null fields; empty text scores
    0.0."""
    c = _col(col)
    urls = F.regexp_extract_all(c, F.lit(URL_PATTERN), 0)
    n = F.length(c)
    url_chars = F.aggregate(
        F.transform(urls, F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    density = F.when(n == 0, F.lit(0.0)).otherwise(
        url_chars.cast("double") / n.cast("double")
    )
    return F.struct(
        n.cast("long").alias("n_chars"),
        F.size(urls).cast("long").alias("n_urls"),
        url_chars.cast("long").alias("url_chars"),
        density.alias("link_density"),
    ).alias("link_stats")


def domain_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus domain table ``(domain, n_urls, n_docs)`` — mention
    count and distinct-document count per linked host. The direct
    input to a recrawl queue or
    :func:`polars_text_spark.operators.sampling.domain_cap`.

    Scale: one explode of the per-doc domain arrays into a
    (domain, doc) aggregation (map-side combine collapses repeat
    mentions within a partition before the shuffle), then a second
    hash aggregation keyed on domain alone — that second shuffle moves
    the ALREADY-COLLAPSED per-document frame, orders smaller than the
    raw mention stream, which is the same two-phase shape as a
    countDistinct but with the mention total preserved."""
    mentions = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__doc"), F.explode(url_domains(text_col)).alias("domain"))
        .filter(F.col("domain") != "")
    )
    per_doc = mentions.groupBy("domain", "__doc").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    return per_doc.groupBy("domain").agg(
        F.sum("__cnt").alias("n_urls"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# query params that identify a CLICK, not a resource — the standard
# normalization list (utm_* campaign tags + the big ad/social click
# ids). Anchored: the filter must match the whole `key=value` token.
TRACKING_PARAM_PATTERN = (
    "^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref|ref_src)"
    "(=.*)?$"
)


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of a URL column — the normalization pass before
    URL-keyed exact dedup or recrawl scheduling, where
    ``https://Ex.COM:443/p?utm_source=x&id=1#frag`` and
    ``https://ex.com/p?id=1`` must collide:

    - scheme and host lower-cased (path/query case is PRESERVED —
      it is significant on most servers);
    - default port stripped (``:80`` for http, ``:443`` for https);
    - fragment dropped (never sent to the server);
    - tracking params (:data:`TRACKING_PARAM_PATTERN`) dropped, other
      params kept in their original order (reordering would merge
      URLs whose servers are order-sensitive — out of scope);
    - empty path normalized to ``/``.

    Pure Catalyst built-ins (regexp extract/replace + array filter),
    map-only, engine-portable (no replacement backrefs — Spark's
    ``$1`` vs RE2's ``\\1`` can never diverge because no replacement
    uses a group). Non-URL input (no ``http(s)://`` prefix) passes
    through unchanged; null in, null out."""
    u = _col(col)
    scheme = F.lower(F.regexp_extract(u, "^(https?)://", 1))
    hostport = F.lower(F.regexp_extract(u, "^https?://([^/?#]*)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).otherwise(F.regexp_replace(hostport, ":443$", ""))
    rest = u.substr(
        F.length(F.regexp_extract(u, "^https?://[^/?#]*", 0)) + F.lit(1),
        F.length(u),
    )
    nofrag = F.regexp_replace(rest, "#.*$", "")
    path = F.regexp_extract(nofrag, "^([^?]*)", 1)
    query = F.regexp_extract(nofrag, "^[^?]*\\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    qstr = F.array_join(kept, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qstr == "", F.lit("")).otherwise(F.concat(F.lit("?"), qstr)),
    )
    return F.when(scheme == "", u).otherwise(rebuilt).alias("canonical_url")


def canonical_url_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus URL table ``(url, n_urls, n_docs)`` keyed on the
    CANONICAL form — the URL-level twin of :func:`domain_frequencies`
    (same two-phase aggregation shape: per-(url, doc) map-side
    collapse, then the url-keyed merge of the already-collapsed
    frame). Feeding a recrawl queue from raw URLs double-counts every
    click-tagged share of the same page; canonicalizing first is what
    makes the counts mean "this resource"."""
    mentions = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__doc"),
            F.explode(extract_urls(text_col)).alias("raw"),
        )
        .select("__doc", canonicalize_url(F.col("raw")).alias("url"))
        .filter(F.col("url") != "")
    )
    per_doc = mentions.groupBy("url", "__doc").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    return per_doc.groupBy("url").agg(
        F.sum("__cnt").alias("n_urls"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def domain_link_edges(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "text",
) -> DataFrame:
    """Domain-level link edge list ``(src, dst)`` from a corpus: one
    edge per (page domain, linked domain) pair that occurs anywhere in
    the corpus — ``src`` is the document's own host (``domain_col``),
    ``dst`` each host mentioned in its text. Self-links and duplicate
    edges are collapsed (``distinct``): at domain granularity an edge
    means "site A endorses site B", not "how many times".

    This is the input :func:`polars_text_spark.operators.graph.
    pagerank` consumes. Scale: one explode of the per-doc domain
    arrays, then the distinct's hash aggregation — map-side combine
    collapses the heavy repeat edges (navigation links repeated on
    every page of a site) before the shuffle, so the exchange carries
    edges, not mentions."""
    return (
        df.filter(
            F.col(text_col).isNotNull() & F.col(domain_col).isNotNull()
        )
        .select(
            F.lower(F.col(domain_col)).alias("src"),
            F.explode(url_domains(text_col)).alias("dst"),
        )
        .filter((F.col("dst") != "") & (F.col("src") != F.col("dst")))
        .distinct()
    )


def domain_suffixes(col: Column | str) -> Column:
    """All label-aligned dot-suffixes of a (lower-folded) domain:
    ``a.b.example.com -> [a.b.example.com, b.example.com, example.com,
    com]``. Label-aligned by construction — ``notexample.biz`` yields
    ``[notexample.biz, biz]``, never ``example.biz`` — which is the
    matching rule a domain blocklist needs (an entry blocks the
    domain and every subdomain, nothing else). Map-only higher-order
    built-ins; null in, null out."""
    parts = F.split(F.lower(_col(col)), "\\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    ).alias("domain_suffixes")


def blocklist_verdict(
    df: DataFrame,
    blocklist: DataFrame,
    *,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    pattern_col: str = "pattern",
) -> DataFrame:
    """``df`` plus a ``blocked`` boolean: true iff any label-aligned
    suffix of the row's domain equals a blocklist ``pattern_col``
    entry (so ``example.com`` in the list blocks ``example.com`` AND
    ``sub.example.com``; patterns are lower-folded to match the
    suffix fold). The standard URL-filter gate (UT1/adult blocklists,
    tracker/ad domain lists) applied at corpus scale.

    Scale: suffix explode is bounded by the domain's label count
    (~4-6), the blocklist join is a BROADCAST semi probe (blocklists
    are config-sized — 10^2..10^6 rows), and the verdict rejoins the
    corpus as a broadcast of the DISTINCT matched-id set. The one
    honest ceiling: the matched-id broadcast assumes blocked rows are
    a minority (the normal case — a blocklist that kills half the
    corpus is a corpus bug, not a filter); if a workload ever blocks
    corpus-scale row counts, swap the final broadcast for a plain
    left join — same semantics, one extra shuffle."""
    pat = blocklist.select(
        F.lower(F.col(pattern_col)).alias("__pat")
    ).distinct()
    hits = (
        df.select(
            F.col(id_col).alias("__hid"),
            F.explode(domain_suffixes(domain_col)).alias("__sfx"),
        )
        .join(F.broadcast(pat), F.col("__sfx") == F.col("__pat"), "semi")
        .select("__hid")
        .distinct()
    )
    out = df.join(
        F.broadcast(hits), df[id_col] == hits["__hid"], "left"
    )
    return out.select(
        *[df[c] for c in df.columns],
        F.col("__hid").isNotNull().alias("blocked"),
    )
