"""Stream-safety of the round-9 web-curation additions: HTML
extraction and code signals are map-only; temperature rebalance is a
literal-rate scan filter (rates fixed by a batch count action, the
mixture_rebalance production shape) — the same transform must produce
the same row multiset on a stream as on the batch frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import code_signals
from polars_text_spark.functions.html import (
    extract_html_text,
    html_anchors,
    html_hrefs,
)
from polars_text_spark.operators.chat import (
    chat_stats,
    parse_chat,
    render_chat,
)
from polars_text_spark.operators.sampling import (
    stratified_sample,
    temperature_rates,
)


def test_web_curation_stream_matches_batch(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    # rates fixed from the BATCH corpus (the production shape: a
    # standing mixture config applied to the incoming stream)
    counts = {
        r[0]: r[1]
        for r in docs.groupBy("lang").count().collect()
        if r[0] is not None
    }
    rates = temperature_rates(counts, 0.5)

    def transform(df):
        kept = stratified_sample(
            df, rates, "lang", "doc_id", default_rate=0.0
        )
        html = F.concat(
            F.lit('<p>'), F.col("text"),
            F.lit('</p><script>x</script><a href="/d/'),
            F.col("doc_id").cast("string"), F.lit('">l</a>'),
        )
        sig = code_signals("text")
        convo = F.concat(
            F.lit('[{"role":"user","content":"q'),
            F.col("doc_id").cast("string"),
            F.lit('"},{"role":"assistant","content":"a"}]'),
        )
        parsed = parse_chat(convo)
        return kept.select(
            "doc_id",
            "lang",
            extract_html_text(html).alias("extracted"),
            F.size(html_hrefs(html)).alias("n_hrefs"),
            F.size(html_anchors(html)).alias("n_anchors"),
            sig["n_symbols"].alias("n_symbols"),
            F.round(sig["score"], 6).alias("code_score"),
            chat_stats(parsed)["valid"].alias("chat_valid"),
            render_chat(parsed).alias("rendered"),
        )

    batch = {tuple(r) for r in transform(docs).collect()}
    assert batch  # non-vacuous

    drop_dir = tmp_path / "docdrops"
    docs.repartition(3).write.parquet(str(drop_dir))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(drop_dir))
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("webcur_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM webcur_stream").collect()
    }
    assert streamed == batch
