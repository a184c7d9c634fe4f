"""Streaming web-compliance gates (streaming/ingest.py::
stream_web_gated_corpus): the robots.txt + domain-blocklist verdicts
applied per micro-batch produce EXACTLY the batch operators' output
(parity is structural — the batch operators run verbatim inside
foreachBatch), redelivery is idempotent via dynamic partition
overwrite, and the full raw-bytes path (WARC stream -> text -> gates)
composes end to end."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from polars_text_spark.operators.robots import parse_robots, robots_verdict
from polars_text_spark.operators.web import blocklist_verdict
from polars_text_spark.sources.warc import read_warc, warc_text_documents
from polars_text_spark.streaming.ingest import (
    stream_web_gated_corpus,
    web_gate_batch,
)
from polars_text_spark.streaming.warc import read_warc_stream
from tests.test_warc import _record


def _crawl(tmp_path):
    """Three shards across three domains: a.example disallows
    /private/, blocked.example is on the domain blocklist (and its
    subdomain must fall with it), b.example is clean."""
    drop = tmp_path / "crawl"
    drop.mkdir()
    (drop / "s0.warc").write_bytes(
        _record(b"<html>open</html>", uri="https://a.example/page")
        + _record(b"<html>secret</html>", uri="https://a.example/private/x")
    )
    (drop / "s1.warc.gz").write_bytes(
        gzip.compress(
            _record(b"<html>bad</html>", uri="https://blocked.example/y")
            + _record(b"<html>sub</html>", uri="https://cdn.blocked.example/z")
        )
    )
    (drop / "s2.warc").write_bytes(
        _record(b"<html>fine</html>", uri="https://b.example/ok")
    )
    return drop


def _fixtures(spark):
    rules = parse_robots(
        spark.createDataFrame(
            [("a.example", "User-agent: *\nDisallow: /private/\n")],
            ["domain", "robots_txt"],
        )
    )
    blocklist = spark.createDataFrame(
        [("blocked.example",)], ["pattern"]
    )
    return rules, blocklist


def _batch_reference(spark, drop, rules, blocklist):
    pages = warc_text_documents(
        read_warc(spark, str(drop) + "/*.{warc,warc.gz}")
    )
    gated = robots_verdict(
        pages, rules, agent="*", url_col="target_uri"
    )
    allowed = gated.filter(F.col("allowed")).drop(
        "allowed", "matched_prefix", "path"
    )
    screened = blocklist_verdict(
        allowed, blocklist, domain_col="domain", id_col="target_uri"
    )
    return screened.filter(~F.col("blocked")).drop("blocked", "domain")


def test_stream_web_gates_match_batch(spark, tmp_path):
    drop = _crawl(tmp_path)
    rules, blocklist = _fixtures(spark)
    want = {
        (r["target_uri"], r["text"])
        for r in _batch_reference(spark, drop, rules, blocklist).collect()
    }
    # the gates must actually gate: 5 pages in, 2 survive
    assert {u for u, _ in want} == {
        "https://a.example/page", "https://b.example/ok",
    }

    out = str(tmp_path / "curated")
    pages = warc_text_documents(
        read_warc_stream(spark, str(drop), max_files_per_trigger=1)
    )
    q = stream_web_gated_corpus(
        pages,
        rules,
        blocklist,
        out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        agent="*",
        url_col="target_uri",
        available_now=True,
    )
    assert q.awaitTermination(600), "web-gate stream did not finish"
    got_rows = spark.read.parquet(out)
    got = {(r["target_uri"], r["text"]) for r in got_rows.collect()}
    assert got == want
    # provenance column present; multiple triggers really happened
    # (maxFilesPerTrigger=1 over 3 shards)
    batches = {r["__ingest_batch"] for r in got_rows.collect()}
    assert len(batches) >= 2


def test_web_gate_redelivery_is_idempotent(spark, tmp_path):
    """At-least-once foreachBatch: redelivering the SAME batch id must
    rewrite that batch's partition, not append a duplicate copy."""
    rules, blocklist = _fixtures(spark)
    out = str(tmp_path / "curated")
    batch = spark.createDataFrame(
        [
            ("https://a.example/page", "text/html", "open"),
            ("https://blocked.example/y", "text/html", "bad"),
        ],
        ["target_uri", "content_type", "text"],
    )
    gate = web_gate_batch(rules, blocklist, out, url_col="target_uri")
    gate(batch, 7)
    gate(batch, 7)  # redelivery
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0]["target_uri"] == "https://a.example/page"
    # a NEW batch appends alongside, untouched by the redelivery
    gate(
        spark.createDataFrame(
            [("https://b.example/ok", "text/html", "fine")],
            ["target_uri", "content_type", "text"],
        ),
        8,
    )
    rows = spark.read.parquet(out)
    assert rows.count() == 2
    assert {r["__ingest_batch"] for r in rows.collect()} == {7, 8}


def test_web_gate_per_batch_plan_stays_broadcast(spark, tmp_path):
    """The per-trigger plan must keep the batch operators' scale
    shape: rules and blocklist ride as broadcasts, no non-broadcast
    pair join of the page frame."""
    from polars_text_spark.plans.explain import explain_str

    rules, blocklist = _fixtures(spark)
    batch = spark.createDataFrame(
        [("https://a.example/page", "text/html", "open")],
        ["target_uri", "content_type", "text"],
    )
    gated = robots_verdict(batch, rules, agent="*", url_col="target_uri")
    allowed = gated.filter(F.col("allowed")).drop(
        "allowed", "matched_prefix", "path"
    )
    screened = blocklist_verdict(
        allowed, blocklist, domain_col="domain", id_col="target_uri"
    )
    plan = explain_str(screened.filter(~F.col("blocked")), "formatted")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
