#!/usr/bin/env python
"""Streaming end-to-end scale probe (VERDICT r10 task #7 / r11 missing
#4): run the examples/stream_web_ingest.py pipeline at 10x the
example's shard count and record PER-TRIGGER wall time + standing-state
growth for every stage, from each query's progress events.

The claim under test: per-trigger cost tracks the TRIGGER'S shard, not
the standing store — the MinHash sink's novelty anti-join probes the
store each batch, so if that probe scaled with store size the trigger
durations would climb as batches accumulate. We report first-half vs
second-half mean trigger duration per stage (and the raw sequence) so
the flatness is a measurement, not an assertion.

Usage: python scripts/scale_probe_stream_ingest.py [sf_dir] [shards]
(defaults /root/testdata/sf0.1, 40 shards = 10x the example's 4).
Writes one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "examples"))

from pyspark.sql import functions as F


def _trigger_ms(q) -> list[tuple[int, int, int]]:
    """(batchId, triggerExecution ms, numInputRows) per progress event,
    deduped by batchId (keep first), no-data batches dropped."""
    seen = {}
    for p in q.recentProgress:
        bid = p["batchId"]
        rows = int(p.get("numInputRows") or 0)
        if rows and bid not in seen:
            seen[bid] = (int(p["durationMs"]["triggerExecution"]), rows)
    return [(b, d, r) for b, (d, r) in sorted(seen.items())]


def _halves(trig) -> dict:
    ds = [d for _, d, _ in trig]
    if len(ds) < 2:
        return {"n_triggers": len(ds), "all": ds}
    mid = len(ds) // 2
    return {
        "n_triggers": len(ds),
        "first_half_mean_ms": round(sum(ds[:mid]) / mid, 1),
        "second_half_mean_ms": round(sum(ds[mid:]) / (len(ds) - mid), 1),
        "max_ms": max(ds),
        "series_ms": ds,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    import polars_text_spark as pts
    from stream_web_ingest import _crawl_shards

    from polars_text_spark.operators.robots import parse_robots
    from polars_text_spark.sources.warc import warc_text_documents
    from polars_text_spark.streaming.ingest import (
        stream_decontaminated_corpus,
        stream_into_minhash_store,
        stream_web_gated_corpus,
    )
    from polars_text_spark.streaming.warc import read_warc_stream

    wh = tempfile.mkdtemp(prefix="stream_probe_wh_")
    spark = pts.get_spark(
        "stream-ingest-probe",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": wh,
            "spark.driver.memory": "8g",
            "spark.sql.streaming.numRecentProgressUpdates": "200",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="stream_probe_")
    crawl = os.path.join(work, "crawl")
    bronze = os.path.join(work, "bronze")
    silver = os.path.join(work, "silver")
    os.makedirs(crawl)
    out: dict = {"probe": "stream_ingest_10x", "sf_dir": sf_dir,
                 "n_docs": n_docs, "shards": shards}
    try:
        _crawl_shards(docs, crawl, shards=shards)

        rules = parse_robots(
            spark.createDataFrame(
                [("crawl.example", "User-agent: *\nDisallow: /private/\n")],
                ["domain", "robots_txt"],
            )
        )
        blocklist = spark.createDataFrame([("blocked.example",)], ["pattern"])
        pages = warc_text_documents(
            read_warc_stream(spark, crawl, max_files_per_trigger=2)
        )
        q1 = stream_web_gated_corpus(
            pages, rules, blocklist, bronze,
            checkpoint_dir=os.path.join(work, "ckpt1"),
            available_now=True,
        )
        assert q1.awaitTermination(1800)
        out["stage1_web_gate"] = _halves(_trigger_ms(q1))
        out["n_bronze"] = spark.read.parquet(bronze).count()

        bench = docs.filter(F.col("doc_id") % 13 == 0).select(
            "doc_id", "text"
        )
        bronze_stream = (
            spark.readStream.schema(spark.read.parquet(bronze).schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(bronze)
        ).select(
            F.abs(F.xxhash64("target_uri")).alias("doc_id"), F.col("text")
        )
        q2 = stream_decontaminated_corpus(
            bronze_stream, bench, silver,
            checkpoint_dir=os.path.join(work, "ckpt2"),
            n=4,
            available_now=True,
        )
        assert q2.awaitTermination(1800)
        out["stage2_decontam_gate"] = _halves(_trigger_ms(q2))
        out["n_silver"] = spark.read.parquet(silver).count()

        # one file per trigger: the sink stage probes the standing
        # store every batch, so it gets the longest trigger series —
        # the store-growth axis is the claim under test
        silver_stream = (
            spark.readStream.schema(spark.read.parquet(silver).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(silver)
        ).select("doc_id", "text")
        q3 = stream_into_minhash_store(
            silver_stream, "probe_gold_mh",
            checkpoint_dir=os.path.join(work, "ckpt3"),
            available_now=True,
        )
        assert q3.awaitTermination(1800)
        out["stage3_minhash_sink"] = _halves(_trigger_ms(q3))
        out["store_band_rows"] = spark.table("probe_gold_mh_bands").count()
        out["store_shingle_rows"] = spark.table(
            "probe_gold_mh_shingles"
        ).count()
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)
        for t in ("probe_gold_mh_shingles", "probe_gold_mh_bands",
                  "probe_gold_mh_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
