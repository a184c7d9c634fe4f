"""Streaming exact-dedup: batch-path golden semantics + stream==batch
fingerprint-set equivalence over file-source drops."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from polars_text_spark.streaming.dedup import (
    DOCS_STREAM_SCHEMA,
    dedup_stream,
    read_docs_stream,
)


def _rows():
    t0 = dt.datetime(2024, 1, 1)
    texts = {
        0: "alpha beta gamma",
        1: "delta epsilon zeta",
        2: "alpha beta gamma",   # dup of 0
        3: "eta theta iota",
        4: "Alpha,  BETA gamma!",  # clean_text-equal to 0
        5: None,                  # dropped
        6: "delta epsilon zeta",  # dup of 1
    }
    return [
        Row(
            doc_id=i,
            text=texts[i],
            lang="en",
            source="s",
            ingest_ts=t0 + dt.timedelta(minutes=i),
        )
        for i in sorted(texts)
    ]


def test_batch_dedup_keeps_min_doc_id(spark):
    df = spark.createDataFrame(_rows(), DOCS_STREAM_SCHEMA)
    out = dedup_stream(df).collect()
    kept = sorted(r.doc_id for r in out)
    # 0 covers 2 and 4 (punctuation/case differences wash out in the
    # clean_text fingerprint); 1 covers 6; null text dropped.
    assert kept == [0, 1, 3]
    assert len({r.fingerprint for r in out}) == 3


def test_streaming_dedup_matches_batch(spark, tmp_path):
    df = spark.createDataFrame(_rows(), DOCS_STREAM_SCHEMA)
    batch_fps = {r.fingerprint for r in dedup_stream(df).collect()}

    drop_dir = tmp_path / "drops"
    df.repartition(3).write.parquet(str(drop_dir))

    stream = read_docs_stream(spark, str(drop_dir), max_files_per_trigger=1)
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    got = spark.sql("SELECT * FROM dedup_docs").collect()

    # Arrival order decides WHICH duplicate survives on the stream, so
    # compare the fingerprint sets, and require exactly one survivor
    # per fingerprint.
    assert {r.fingerprint for r in got} == batch_fps
    assert len(got) == len(batch_fps)
