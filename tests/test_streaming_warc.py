"""Streaming WARC ingestion == batch (stream-safety of the record
parse + downstream text decode), plus the temp-file drop protocol."""

from __future__ import annotations

import gzip

from polars_text_spark.sources.warc import read_warc, warc_text_documents
from polars_text_spark.streaming.warc import read_warc_stream
from tests.test_warc import _record


def test_warc_stream_matches_batch(spark, tmp_path):
    drop = tmp_path / "crawl"
    drop.mkdir()
    (drop / "s0.warc").write_bytes(
        _record(b"<html>one</html>", uri="https://a.example/1")
        + _record(b"<html>two</html>", uri="https://a.example/2")
    )
    (drop / "s1.warc.gz").write_bytes(
        gzip.compress(_record(b"<html>three</html>", uri="https://b.example/3"))
    )
    # an in-progress upload must be invisible until renamed
    (drop / "s2.warc.gz.tmp").write_bytes(_record(b"partial"))

    batch = {
        (r["target_uri"], r["text"])
        for r in warc_text_documents(
            read_warc(spark, str(drop) + "/*.{warc,warc.gz}")
        ).collect()
        if not r["target_uri"] is None
    }

    stream = read_warc_stream(spark, str(drop), max_files_per_trigger=1)
    q = (
        warc_text_documents(stream)
        .writeStream.format("memory")
        .queryName("warc_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "warc stream did not finish"
    streamed = {
        (r["target_uri"], r["text"])
        for r in spark.sql("SELECT * FROM warc_stream_out").collect()
    }
    assert streamed == batch
    assert len(streamed) == 3  # the .warc.gz.tmp upload is filtered out
