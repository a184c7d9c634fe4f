"""Streaming decontamination gate (streaming/ingest.py::
stream_decontaminated_corpus): per micro-batch n-gram collision
verdicts match the batch operator exactly, contaminated rows drop
before entering the corpus, audit mode keeps counts, and redelivery is
idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.decontam import ngram_contamination
from polars_text_spark.streaming.ingest import (
    decontam_gate_batch,
    stream_decontaminated_corpus,
)


def _fixtures(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    bench = docs.filter(F.col("doc_id") % 13 == 0)
    cand = docs.filter(F.col("doc_id") % 13 != 0)
    return cand, bench


def test_stream_decontam_matches_batch(spark, sf_dir, tmp_path):
    cand, bench = _fixtures(spark, sf_dir)
    hits = ngram_contamination(cand, bench, "text", "doc_id", n=4)
    dirty = {r.doc_id for r in hits.filter("n_shared_shingles > 0").collect()}
    want = {r.doc_id for r in cand.collect()} - dirty
    assert dirty, "fixture must actually contaminate something"

    qdir = tmp_path / "drops"
    cand.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(qdir), mode="append"
    )
    cand.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(qdir), mode="append"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir))
    )
    out = str(tmp_path / "clean")
    q = stream_decontaminated_corpus(
        stream,
        bench,
        out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n=4,
        available_now=True,
    )
    assert q.awaitTermination(600), "decontam stream did not finish"
    got_rows = spark.read.parquet(out)
    got = {r.doc_id for r in got_rows.collect()}
    assert got == want
    assert {r["__ingest_batch"] for r in got_rows.collect()} == {0, 1}


def test_decontam_gate_audit_mode_and_redelivery(spark, sf_dir, tmp_path):
    cand, bench = _fixtures(spark, sf_dir)
    batch = cand.limit(50)
    out = str(tmp_path / "audit")
    gate = decontam_gate_batch(bench, out, n=4, keep_flags=True)
    gate(batch, 3)
    gate(batch, 3)  # redelivery rewrites partition 3
    rows = spark.read.parquet(out)
    assert rows.count() == 50
    # audit mode keeps every row WITH its collision count
    assert "n_shared_shingles" in rows.columns
    counts = {r.doc_id: r.n_shared_shingles for r in rows.collect()}
    want = {
        r.doc_id: r.n_shared_shingles
        for r in ngram_contamination(batch, bench, n=4).collect()
    }
    for did, cnt in counts.items():
        assert cnt == want.get(did, 0)
