"""Streaming-first crawl pipeline: the streaming twin of
examples/web_ingest.py, staged as chained file-sink streams (the
bronze/silver/gold shape a real crawl runs continuously):

  1. WARC shards land in a drop directory -> read_warc_stream ->
     warc_text_documents -> robots.txt + domain-blocklist gates
     (stream_web_gated_corpus) -> BRONZE parquet;
  2. bronze stream -> benchmark n-gram decontamination gate
     (stream_decontaminated_corpus) -> SILVER parquet;
  3. silver stream -> MinHash near-dup store ingest
     (stream_into_minhash_store) -> the standing GOLD dedup store,
     ready for incremental_pairs_from_store.

Each stage is exactly-once (dynamic partition overwrite / novelty
anti-join), each gate runs its BATCH operator verbatim per micro-batch
(parity is structural and pytest-pinned), and every stage keeps
running as new shards land — here driven with availableNow so the
script terminates.

Runs at sf0.001 in ~2 min:  python examples/stream_web_ingest.py [sf_dir]
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
from polars_text_spark.operators.dedup_store import pairs_from_store
from polars_text_spark.operators.robots import parse_robots
from polars_text_spark.sources.warc import warc_text_documents
from polars_text_spark.streaming.ingest import (
    stream_decontaminated_corpus,
    stream_into_minhash_store,
    stream_web_gated_corpus,
)
from polars_text_spark.streaming.warc import read_warc_stream


def _crawl_shards(docs, out_dir: str, shards: int = 4) -> None:
    def record(doc_id: int, text: str) -> bytes:
        html = (
            f"<html><head><title>doc {doc_id}</title></head>"
            f"<body><p>{text}</p></body></html>"
        ).encode()
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:{doc_id}>\r\n".encode()
            + f"WARC-Target-URI: https://crawl.example/{doc_id}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http
            + b"\r\n\r\n"
        )

    rows = docs.select("doc_id", "text").collect()
    handles = [
        open(os.path.join(out_dir, f"shard-{i:05d}.warc.gz"), "wb")
        for i in range(shards)
    ]
    try:
        for r in rows:
            handles[r["doc_id"] % shards].write(
                gzip.compress(record(r["doc_id"], r["text"]))
            )
    finally:
        for h in handles:
            h.close()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pts.get_spark("stream-web-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    work = tempfile.mkdtemp(prefix="stream_crawl_")
    crawl = os.path.join(work, "crawl")
    bronze = os.path.join(work, "bronze")
    silver = os.path.join(work, "silver")
    os.makedirs(crawl)
    try:
        _crawl_shards(docs, crawl)
        print(f"== crawl drop: {len(os.listdir(crawl))} WARC shards")

        # stage 1: raw bytes -> compliance-gated bronze corpus
        rules = parse_robots(
            spark.createDataFrame(
                [("crawl.example", "User-agent: *\nDisallow: /private/\n")],
                ["domain", "robots_txt"],
            )
        )
        blocklist = spark.createDataFrame([("blocked.example",)], ["pattern"])
        pages = warc_text_documents(read_warc_stream(spark, crawl))
        q1 = stream_web_gated_corpus(
            pages, rules, blocklist, bronze,
            checkpoint_dir=os.path.join(work, "ckpt1"),
            available_now=True,
        )
        assert q1.awaitTermination(600)
        n_bronze = spark.read.parquet(bronze).count()
        print(f"bronze (robots+blocklist gated): {n_bronze} pages")

        # stage 2: bronze stream -> benchmark-decontaminated silver
        bench = docs.filter(F.col("doc_id") % 13 == 0).select("doc_id", "text")
        bronze_stream = (
            spark.readStream.schema(spark.read.parquet(bronze).schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(bronze)
        ).select(
            F.abs(F.xxhash64("target_uri")).alias("doc_id"),
            F.col("text"),
        )
        q2 = stream_decontaminated_corpus(
            bronze_stream, bench, silver,
            checkpoint_dir=os.path.join(work, "ckpt2"),
            n=4,
            available_now=True,
        )
        assert q2.awaitTermination(600)
        n_silver = spark.read.parquet(silver).count()
        print(f"silver (decontaminated): {n_silver} pages "
              f"({n_bronze - n_silver} benchmark collisions dropped)")

        # stage 3: silver stream -> standing MinHash dedup store
        silver_stream = (
            spark.readStream.schema(spark.read.parquet(silver).schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(silver)
        ).select("doc_id", "text")
        q3 = stream_into_minhash_store(
            silver_stream, "stream_gold_mh",
            checkpoint_dir=os.path.join(work, "ckpt3"),
            available_now=True,
        )
        assert q3.awaitTermination(600)
        pairs = pairs_from_store(spark, "stream_gold_mh", jaccard_threshold=0.7)
        print(f"gold store near-dup pairs (j>=0.7): {pairs.count()}")
        print("== streaming crawl pipeline complete")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        for t in ("stream_gold_mh_shingles", "stream_gold_mh_bands",
                  "stream_gold_mh_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
