"""Stream-safety proof for the byte-level + membership map-only ops:
PCM16 synth/decode, WARC record parsing, and the broadcast Bloom
probe all run unchanged on a streaming frame (stateless, scan-fused)
and produce exactly the batch result under availableNow."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.bloom import bloom_fit, bloom_might_contain
from polars_text_spark.operators.multimodal import (
    synth_wav_pcm16,
    wav_pcm_stats,
)
from polars_text_spark.sources.warc import parse_warc_records


def _pipeline(docs, bloom):
    """Per doc: pack a deterministic PCM train into WAV bytes and
    decode its stats; wrap the text into a WARC record and sweep it
    back; probe the text against a static pre-fit Bloom. Every stage
    is an elementwise projection (the Bloom bits ride a broadcast
    1-row static frame — the stream-static join Spark allows)."""
    n = F.lit(8) + F.col("doc_id") % 8
    samples = F.transform(
        F.sequence(F.lit(0), (n - 1).cast("int")),
        lambda t: (
            F.pmod(F.col("doc_id") * 31 + t.cast("long") * 97, F.lit(65536))
            - 32768
        ).cast("int"),
    )
    warc = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: "),
        F.octet_length("text").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("text"),
    )
    d = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        "text",
        synth_wav_pcm16(samples).alias("wav"),
        F.encode(warc, "UTF-8").alias("warc"),
    )
    d = d.select(
        "doc_id",
        "text",
        wav_pcm_stats("wav").alias("pcm"),
        F.element_at(parse_warc_records("warc"), 1).alias("rec"),
    )
    d = bloom_might_contain(d, "text", bloom, out_col="maybe_seen")
    return d.select(
        "doc_id",
        F.round("pcm.rms", 6).alias("rms"),
        F.col("pcm.peak").alias("peak"),
        F.length("rec.payload").alias("n_payload"),
        F.col("rec.content_length").alias("content_length"),
        "maybe_seen",
    )


def test_streaming_bytes_ops_match_batch(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # static Bloom over a slice of the corpus text — probed by both
    # the batch and the streaming run
    bloom = bloom_fit(
        docs.where(F.col("doc_id") % 3 == 0),
        "text",
        m_bits=4096,
        n_hashes=4,
    )
    batch = {tuple(r) for r in _pipeline(docs, bloom).collect()}
    # the %3 slice must probe positive: no false negatives, streamed
    # or not
    assert batch

    drop = tmp_path / "docs"
    docs.repartition(3).write.parquet(str(drop))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(drop))
    )
    q = (
        _pipeline(stream, bloom)
        .writeStream.format("memory")
        .queryName("bytes_ops_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "bytes-ops stream did not finish"
    streamed = {
        tuple(r)
        for r in spark.sql("SELECT * FROM bytes_ops_stream").collect()
    }
    assert streamed == batch
