"""Stream==batch parity for the round-10 quality batteries (VERDICT
r11 missing #3 / r10 task #6): the C4 line+page battery is map-only —
the same transform must produce the same row multiset on a stream —
and trigram scoring against a STANDING model (fit once on a batch
reference corpus) is stream-static joins + a per-doc aggregate, the
production shape of a perplexity gate on an incoming crawl."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.filters import c4_clean_lines, with_c4_tags
from polars_text_spark.operators.quality import (
    fit_trigram_lm,
    score_trigram_lm,
    trigram_interpolated_surprisal,
)


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )


def _stream_of(spark, df, tmp_path, name):
    drop_dir = tmp_path / name
    df.repartition(3).write.parquet(str(drop_dir))
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(drop_dir))
    )


def test_c4_battery_stream_matches_batch(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)

    def transform(df):
        # the synthetic corpus has no sentence terminators or
        # newlines; derive a deterministic mix so the battery's
        # verdict is non-vacuous on both paths (pass / fail
        # min_sentences / fail no_curly_brace by doc_id mod 3)
        suffix = (
            F.when(F.col("doc_id") % 3 == 0, F.lit("."))
            .when(F.col("doc_id") % 3 == 1, F.lit(""))
            .otherwise(F.lit(" curly { brace."))
        )
        df = df.withColumn("text", F.concat("text", suffix))
        tagged = with_c4_tags(
            df, "text", min_words_per_line=3, min_sentences=1,
            bad_words=("zebra",),
        )
        return tagged.select(
            "doc_id",
            "keep",
            "rule_min_sentences",
            "rule_no_lorem_ipsum",
            "rule_no_curly_brace",
            "rule_no_bad_words",
            F.length("c4_text").alias("clean_len"),
            F.length(c4_clean_lines("text", min_words=2)).alias(
                "clean_len_2w"
            ),
        )

    batch = {tuple(r) for r in transform(docs).collect()}
    assert batch  # non-vacuous
    assert any(r[1] for r in batch) and not all(r[1] for r in batch)

    q = (
        transform(_stream_of(spark, docs, tmp_path, "c4drops"))
        .writeStream.format("memory")
        .queryName("c4_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM c4_stream").collect()
    }
    assert streamed == batch


def test_trigram_scoring_stream_matches_batch(spark, sf_dir, tmp_path):
    """Fit the LM ONCE on the batch corpus (the standing model), score
    the same corpus arriving as a stream: every model join is
    stream-static, the per-doc aggregate runs in complete mode, and
    the result set must equal the batch self-score (avg rounded to 6 —
    micro-batch partial sums may reassociate the float mean)."""
    docs = _docs(spark, sf_dir).limit(200)
    model = fit_trigram_lm(docs)

    def rounded(df):
        return {
            (r.doc_id, r.n_trigrams, round(r.avg_surprisal, 6))
            for r in df.collect()
        }

    batch = rounded(trigram_interpolated_surprisal(docs))
    assert batch  # non-vacuous
    assert batch == rounded(score_trigram_lm(docs, model))

    scored = score_trigram_lm(
        _stream_of(spark, docs, tmp_path, "tgdrops"), model
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("tg_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        (r.doc_id, r.n_trigrams, round(r.avg_surprisal, 6))
        for r in spark.sql("SELECT * FROM tg_stream").collect()
    }
    assert streamed == batch


def test_trigram_scoring_skips_unknown_trigrams(spark):
    """Scoring a DIFFERENT corpus than the fit one: trigrams absent
    from the model drop via the inner joins; a doc with zero known
    trigrams is absent from the output."""
    ref = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    model = fit_trigram_lm(ref)
    new = spark.createDataFrame(
        [(10, "a b c x"), (11, "x y z w")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.n_trigrams for r in
            score_trigram_lm(new, model).collect()}
    # doc 10: "a b c" known, "b c x" unknown -> 1 scored trigram;
    # doc 11: nothing known -> absent
    assert rows == {10: 1}


def test_trigram_backoff_stream_matches_batch(spark, sf_dir, tmp_path):
    """The OOV-backoff mode (round 13) on a streaming frame: LEFT
    stream-static joins + the coverage aggregate must equal the batch
    cross-corpus score — fit on 2/3 of the corpus, stream the held-out
    third."""
    docs = _docs(spark, sf_dir).limit(300)
    fit = docs.filter(F.col("doc_id") % 3 != 0)
    held = docs.filter(F.col("doc_id") % 3 == 0)
    model = fit_trigram_lm(fit)

    def rounded(df):
        return {
            (
                r.doc_id,
                r.n_trigrams,
                r.n_unknown,
                round(r.coverage, 6),
                round(r.avg_surprisal, 6),
            )
            for r in df.collect()
        }

    batch = rounded(score_trigram_lm(held, model, oov="backoff"))
    assert batch
    assert any(r[2] > 0 for r in batch)  # OOV mass genuinely present
    scored = score_trigram_lm(
        _stream_of(spark, held, tmp_path, "tgbackoff"), model, oov="backoff"
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("tg_backoff_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        (
            r.doc_id,
            r.n_trigrams,
            r.n_unknown,
            round(r.coverage, 6),
            round(r.avg_surprisal, 6),
        )
        for r in spark.sql("SELECT * FROM tg_backoff_stream").collect()
    }
    assert streamed == batch
