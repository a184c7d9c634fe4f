"""Raw crawl -> curated corpus: the WARC-first ingestion path.

Runs at sf0.001 in ~1 min:

    python examples/web_ingest.py [sf_dir]

Stages: synthesize a mini WARC crawl on disk (documents wrapped as
HTML pages — stands in for Common Crawl shards) -> read_warc ->
textual-response filter -> robots.txt compliance gate -> HTML text
extraction -> language + quality signals -> Bloom-prefiltered
benchmark decontamination -> MinHash near-dedup -> funnel report.
Every stage is the same operator the driver queries exercise; this
script shows them composed end to end from raw bytes.
"""

from __future__ import annotations

import gzip
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import polars_text_spark as pts
from polars_text_spark.functions.analysis import detect_language
from polars_text_spark.functions.html import extract_html_text
from polars_text_spark.operators.decontam import bloom_ngram_contamination
from polars_text_spark.operators.dedup import minhash_band_plan, minhash_lsh_pairs
from polars_text_spark.operators.robots import parse_robots, robots_verdict
from polars_text_spark.sources.warc import read_warc, warc_text_documents


def _crawl_shards(docs, out_dir: str, shards: int = 4) -> None:
    """Wrap each document as an HTML page inside a WARC response
    record and write gzip-member shards — a miniature Common Crawl."""

    def record(doc_id: int, text: str) -> bytes:
        html = (
            f"<html><head><title>doc {doc_id}</title></head>"
            f"<body><p>{text}</p></body></html>"
        ).encode()
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )
        return (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:{doc_id}>\r\n".encode()
            + f"WARC-Target-URI: https://crawl.example/{doc_id}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http
            + b"\r\n\r\n"
        )

    rows = docs.select("doc_id", "text").collect()  # sf0.001: ~100 docs
    handles = [
        open(os.path.join(out_dir, f"shard-{i:05d}.warc.gz"), "wb")
        for i in range(shards)
    ]
    try:
        for r in rows:
            h = handles[r["doc_id"] % shards]
            h.write(gzip.compress(record(r["doc_id"], r["text"])))
    finally:
        for h in handles:
            h.close()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pts.get_spark("web-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    crawl_dir = tempfile.mkdtemp(prefix="mini_crawl_")
    try:
        _crawl_shards(docs, crawl_dir)
        print(f"== mini crawl written: {len(os.listdir(crawl_dir))} shards")

        records = read_warc(spark, crawl_dir)
        print(f"WARC records: {records.count()}")

        pages = warc_text_documents(records)

        # crawl-compliance: the site's robots.txt gates what may
        # enter the corpus (here: /private/ paths are disallowed —
        # every synthesized URL is open, so the gate is a pass-through
        # proof of plumbing, not a filter of convenience)
        robots = spark.createDataFrame(
            [("crawl.example", "User-agent: *\nDisallow: /private/\n")],
            ["domain", "robots_txt"],
        )
        gated = robots_verdict(
            pages, parse_robots(robots), agent="*", url_col="target_uri"
        )
        n_blocked = gated.filter(~F.col("allowed")).count()
        print(f"robots-disallowed pages dropped: {n_blocked}")
        pages = gated.filter(F.col("allowed")).select(
            "target_uri", "content_type", "text"
        )

        corpus = pages.select(
            F.abs(F.xxhash64("target_uri")).alias("doc_id"),
            "target_uri",
            extract_html_text("text").alias("text"),
        )
        corpus = corpus.withColumn("lang", detect_language("text"))
        print("language mix:")
        corpus.groupBy("lang").count().orderBy(F.desc("count")).show(5)

        # benchmark decontamination with the Bloom prefilter: the
        # "benchmark" is a slice of the same corpus, so hits are
        # guaranteed and the confirm join stays exact
        bench = corpus.filter(F.col("doc_id") % 13 == 0)
        cand = corpus.filter(F.col("doc_id") % 13 != 0)
        contaminated = bloom_ngram_contamination(cand, bench, n=4)
        n_contaminated = contaminated.count()
        print(f"contaminated vs benchmark slice: {n_contaminated}")

        # near-dedup with planner-chosen banding at threshold 0.8
        bands, rows_per_band = minhash_band_plan(0.8, 64)
        print(f"band plan for t=0.8: {bands} bands x {rows_per_band} rows")
        pairs = minhash_lsh_pairs(
            corpus, "text", "doc_id", num_perm=64, bands=bands
        )
        n_pairs = pairs.count()
        print(f"near-dup candidate pairs: {n_pairs}")

        kept = (
            cand.join(
                contaminated.select("doc_id"), "doc_id", "left_anti"
            ).count()
        )
        print(
            f"funnel: {docs.count()} crawled -> {corpus.count()} extracted"
            f" -> {kept} decontaminated survivors"
        )
    finally:
        shutil.rmtree(crawl_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
