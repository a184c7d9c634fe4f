"""Stream-safety of the round-9 selection ops: dsir_sample (against a
static weights frame), apply_epoch_plan, and the stub dHash are all
map-only / stream-static, so the same transform must produce the same
row multiset on a stream as on the batch frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.budget import apply_epoch_plan
from polars_text_spark.operators.dsir import (
    dsir_fit,
    dsir_log_weights,
    dsir_sample,
)
from polars_text_spark.operators.phash import dhash_chunks, stub_pixels


def test_selection_pipeline_stream_matches_batch(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    # fit + weights on the BATCH corpus (the production shape: the
    # model and weights are standing artifacts; the stream is scored
    # against them)
    target = docs.filter(F.col("lang") == "en")
    ratio = dsir_fit(docs, target, buckets=1024)
    weights_path = tmp_path / "weights"
    dsir_log_weights(docs, ratio, buckets=1024).write.parquet(
        str(weights_path)
    )
    weights = spark.read.parquet(str(weights_path))
    plan = {"en": 1.5, "de": 2.0, "fr": 0.5}

    def transform(df, w):
        selected = dsir_sample(df, w, beta=4.0, salt="st")
        epoched = apply_epoch_plan(selected, plan, "lang", "doc_id")
        return epoched.select(
            "doc_id",
            "lang",
            "epoch",
            dhash_chunks(stub_pixels(F.encode("text", "UTF-8"))).alias("sig"),
        )

    batch = {
        (r["doc_id"], r["lang"], r["epoch"], tuple(r["sig"]))
        for r in transform(docs, weights).collect()
    }
    assert batch  # non-vacuous

    drop_dir = tmp_path / "docdrops"
    docs.repartition(3).write.parquet(str(drop_dir))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(drop_dir))
    )
    q = (
        transform(stream, weights)
        .writeStream.format("memory")
        .queryName("sel_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        (r["doc_id"], r["lang"], r["epoch"], tuple(r["sig"]))
        for r in spark.sql("SELECT * FROM sel_stream").collect()
    }
    assert streamed == batch
