"""SQL-surface registration, embed_column dispatch, plan-shape checks,
and stream-safety of the elementwise ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import polars_text_spark as pts
from polars_text_spark.functions import clean_text, tokenize, word_count
from polars_text_spark.functions.embedding import embed_column
from polars_text_spark.plans import has_broadcast_join, pushed_filters


def test_sql_functions_match_column_api(spark):
    pts.register_sql_functions(spark)
    rows = [(1, "Hello, World! 123"), (2, "今天天气很好"), (3, None), (4, "  one   two  ")]
    df = spark.createDataFrame(rows, ["id", "text"])
    df.createOrReplaceTempView("sql_t")
    via_sql = spark.sql(
        "SELECT id, pt_clean_text(text) AS clean, pt_word_count(text) AS wc, "
        "pt_char_count(text) AS cc, pt_sentence_count(text) AS sc FROM sql_t"
    ).collect()
    via_api = df.select(
        "id",
        clean_text("text").alias("clean"),
        word_count("text").alias("wc"),
        F.coalesce(F.length("text").cast("long"), F.lit(0)).alias("cc"),
    ).collect()
    sql_by_id = {r.id: r for r in via_sql}
    api_by_id = {r.id: r for r in via_api}
    for i in sql_by_id:
        assert sql_by_id[i].clean == api_by_id[i].clean
        assert sql_by_id[i].wc == api_by_id[i].wc
        assert sql_by_id[i].cc == api_by_id[i].cc


def test_sql_tokens_udf(spark):
    pts.register_sql_functions(spark)
    row = spark.sql("SELECT pt_tokens('Hello, world!') AS t").first()
    assert [x.token for x in row.t] == ["hello", "world"]


def test_sql_readability_and_entropy_match_column_api(spark):
    import math

    from polars_text_spark.functions.analysis import char_entropy, readability

    pts.register_sql_functions(spark)
    df = spark.createDataFrame(
        [(1, "The cat sat. It ran!"), (2, "aabb"), (3, None)], ["id", "text"]
    )
    df.createOrReplaceTempView("sql_read_t")
    via_sql = {
        r.id: r
        for r in spark.sql(
            "SELECT id, pt_syllables(text) AS syl, pt_flesch(text) AS fl, "
            "pt_char_entropy(text) AS ent FROM sql_read_t"
        ).collect()
    }
    via_api = {
        r.id: r
        for r in df.select(
            "id",
            readability("text")["n_syllables"].alias("syl"),
            readability("text")["flesch"].alias("fl"),
            char_entropy("text").alias("ent"),
        ).collect()
    }
    for i in via_sql:
        assert via_sql[i].syl == via_api[i].syl
        if via_api[i].fl is None:
            assert via_sql[i].fl is None
        else:
            assert via_sql[i].fl == pytest.approx(via_api[i].fl, abs=1e-9)
        if via_api[i].ent is None:
            assert via_sql[i].ent is None
        else:
            assert via_sql[i].ent == pytest.approx(via_api[i].ent, abs=1e-12)
    assert via_sql[2].ent == pytest.approx(1.0)
    assert math.isclose(via_sql[1].fl, 206.835 - 1.015 * 2.5 - 84.6 * 1.0)


def test_embed_column_dispatch(spark):
    df = spark.createDataFrame(
        [(1, "hello", ["a", "b"]), (2, None, None)],
        "id: long, text: string, chunks: array<string>",
    )
    s = embed_column(df, "text", embedder_model="native:feature-hash:8")
    assert isinstance(s.schema["embedding"].dataType.elementType, T.FloatType)
    got = {r.id: r.embedding for r in s.collect()}
    assert len(got[1]) == 8 and got[2] == []

    nested = embed_column(df, "chunks", embedder_model="native:feature-hash:8")
    elem = nested.schema["embedding"].dataType.elementType
    assert isinstance(elem, T.ArrayType)
    got = {r.id: r.embedding for r in nested.collect()}
    assert len(got[1]) == 2 and len(got[1][0]) == 8
    assert got[2] == []

    with pytest.raises(TypeError):
        embed_column(df, "id")


def test_broadcast_join_in_revenue_query(spark, sf_dir):
    from polars_text_spark.queries import q_top_customer_revenue

    q = q_top_customer_revenue(spark, sf_dir)
    assert has_broadcast_join(q)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select(
        clean_text("text"), word_count("text")
    )
    filters = " ".join(pushed_filters(q))
    assert "EqualTo(lang,en)" in filters


def test_elementwise_ops_are_stream_safe(spark, sf_dir, tmp_path):
    """The same Column expressions run unchanged on a readStream frame
    (SURVEY §1.1: scalar ops are stateless and stream-safe for free)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    drop_dir = str(tmp_path / "docs_stream")
    docs.write.parquet(drop_dir)

    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(drop_dir)
    )
    from polars_text_spark.functions.analysis import line_stats
    from polars_text_spark.operators.pii import redact_pii

    transformed = stream.select(
        "doc_id",
        clean_text("text"),
        word_count("text"),
        tokenize("text", model="native:plain_words_en"),
        redact_pii("text").alias("red"),
        line_stats("text").alias("ls"),
    )
    q = (
        transformed.writeStream.format("memory")
        .queryName("docs_ops")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    got = spark.sql("SELECT * FROM docs_ops").collect()
    assert len(got) == 50
    batch = {r.doc_id: r for r in docs.select(
        "doc_id", clean_text("text"), word_count("text"),
        redact_pii("text").alias("red"), line_stats("text").alias("ls"),
    ).collect()}
    for r in got:
        assert r.clean_text == batch[r.doc_id].clean_text
        assert r.word_count == batch[r.doc_id].word_count
        assert len(r.tokens) == r.word_count  # all-word corpus
        assert r.red == batch[r.doc_id].red
        assert r.ls == batch[r.doc_id].ls
