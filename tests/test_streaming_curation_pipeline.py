"""Composed streaming curation pipeline == batch: filter -> dedup ->
quality columns, with the round-7 map-only ops in the stream path."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import char_entropy, readability
from polars_text_spark.streaming.dedup import dedup_stream


def _pipeline(docs):
    """The shared transform: quality gate -> dedup -> scored columns.
    Every stage is stateless-or-watermarked, so the same function runs
    on batch and streaming frames."""
    gated = docs.where(
        F.col("text").isNotNull() & (F.length("text") >= 20)
    )
    deduped = dedup_stream(gated, watermark="2 hours")
    r = readability("text")
    return deduped.select(
        "fingerprint",
        F.round(char_entropy("text"), 6).alias("entropy"),
        r["n_words"].alias("n_words"),
        F.round(r["flesch"], 6).alias("flesch"),
    )


def test_streaming_curation_matches_batch(spark, sf_dir, tmp_path):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("ingest_ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")))
    )
    batch = {
        (r["fingerprint"], r["entropy"], r["n_words"], r["flesch"])
        for r in _pipeline(docs).collect()
    }

    drop_dir = tmp_path / "docdrops"
    docs.repartition(3).write.parquet(str(drop_dir))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(drop_dir))
    )
    out = _pipeline(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        (r["fingerprint"], r["entropy"], r["n_words"], r["flesch"])
        for r in spark.sql("SELECT * FROM curated_stream").collect()
    }
    # corpus has no exact dups at this sf, so keeper choice can't
    # diverge between the min-id batch path and first-seen stream path
    assert streamed == batch and streamed


def test_streaming_weighted_sample_and_fim_match_batch(spark, sf_dir, tmp_path):
    """The round-8 map-only curation ops (quality-weighted sampling,
    FIM rewrite) are stream-safe: running them on a file stream yields
    exactly the batch row set — both are pure projections/filters with
    no state, so availableNow processing must be value-identical."""
    from polars_text_spark.functions.analysis import ws_token_array
    from polars_text_spark.operators.packing import fim_transform
    from polars_text_spark.operators.sampling import weighted_sample

    def transform(docs):
        kept = weighted_sample(
            docs.where(F.col("text").isNotNull()),
            F.size(ws_token_array("text")) / F.lit(200.0),
            "doc_id",
            salt="q",
        )
        return fim_transform(kept, "text", "doc_id", fim_rate=0.5).select(
            "doc_id", "fim_applied", "fim_text"
        )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = {tuple(r) for r in transform(docs).collect()}
    assert batch  # the sample keeps a real subset

    drop_dir = tmp_path / "wdrops"
    docs.repartition(3).write.parquet(str(drop_dir))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop_dir))
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("wfim_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM wfim_stream").collect()
    }
    assert streamed == batch


def test_streaming_link_stats_matches_batch(spark, sf_dir, tmp_path):
    """The round-9 web signals (URL extraction + link-density struct +
    dehyphenation repair) are map-only projections — running them on a
    file stream under availableNow must yield exactly the batch row
    set (stream-safety proof for the new curation ops)."""
    from polars_text_spark.functions.analysis import dehyphenate
    from polars_text_spark.operators.web import link_stats, url_domains

    def transform(docs):
        t = F.concat(
            F.col("text"),
            F.lit(" wrap-\r\nped https://s"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.org/p"),
        )
        return docs.where(F.col("text").isNotNull()).select(
            "doc_id",
            link_stats(t).alias("ls"),
            url_domains(t).alias("doms"),
            F.length(dehyphenate(t)).alias("rep_len"),
        ).select(
            "doc_id",
            F.col("ls.n_urls").alias("n_urls"),
            F.round(F.col("ls.link_density"), 9).alias("density"),
            F.concat_ws(",", "doms").alias("doms"),
            "rep_len",
        )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = {tuple(r) for r in transform(docs).collect()}
    assert batch and any(r[1] > 0 for r in batch)

    drop_dir = tmp_path / "webdrops"
    docs.repartition(3).write.parquet(str(drop_dir))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop_dir))
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("web_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM web_stream").collect()
    }
    assert streamed == batch


def test_streaming_url_canonicalization_matches_batch(spark, sf_dir, tmp_path):
    """canonicalize_url is a map-only projection — stream output under
    availableNow must equal the batch row set exactly (stream-safety
    proof for the canonicalizer; the frequency AGGREGATE is the batch
    half, like link top-k)."""
    from polars_text_spark.operators.web import canonicalize_url, extract_urls

    def transform(docs):
        return (
            docs.where(F.col("text").isNotNull())
            .select(
                "doc_id",
                F.explode(
                    extract_urls(
                        F.concat(
                            F.col("text"),
                            F.lit(" https://EX"),
                            (F.col("doc_id") % 5).cast("string"),
                            F.lit(".com:443/p?utm_source=x&id=1#f"),
                        )
                    )
                ).alias("raw"),
            )
            .select("doc_id", canonicalize_url(F.col("raw")).alias("url"))
        )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = {tuple(r) for r in transform(docs).collect()}
    assert batch

    drop_dir = tmp_path / "udrops"
    docs.repartition(3).write.parquet(str(drop_dir))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop_dir))
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("urlcanon_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM urlcanon_stream").collect()
    }
    assert streamed == batch


def test_streaming_license_and_suffixes_match_batch(spark, sf_dir, tmp_path):
    """license_signals and domain_suffixes are map-only projections —
    a file stream under availableNow must yield exactly the batch row
    set (stream-safety proof for the governance scan: a license gate
    that only works in batch can't guard a continuously-ingesting
    corpus)."""
    from polars_text_spark.functions.analysis import license_signals
    from polars_text_spark.operators.web import domain_suffixes

    def transform(docs):
        t = F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(" Released under the MIT License."),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.lit(" All rights reserved."),
            )
            .otherwise(F.lit("")),
        )
        dom = F.concat(
            F.lit("a.b"),
            (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.com"),
        )
        return (
            docs.where(F.col("text").isNotNull())
            .select(
                "doc_id",
                license_signals(t).alias("lic"),
                domain_suffixes(dom).alias("sfx"),
            )
            .select(
                "doc_id",
                F.col("lic.verdict").alias("verdict"),
                F.col("lic.n_permissive").alias("n_permissive"),
                F.concat_ws(",", "sfx").alias("sfx"),
            )
        )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = {tuple(r) for r in transform(docs).collect()}
    assert batch and {r[1] for r in batch} >= {
        "permissive", "rights_reserved", "none",
    }

    drop_dir = tmp_path / "licdrops"
    docs.repartition(3).write.parquet(str(drop_dir))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop_dir))
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("lic_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM lic_stream").collect()
    }
    assert streamed == batch
