from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.namespace import enable_column_namespace


def test_column_text_namespace(spark):
    enable_column_namespace()
    enable_column_namespace()  # idempotent
    df = spark.createDataFrame([(1, "Hello, World! One. Two?")], ["id", "text"])
    row = df.select(
        F.col("text").text.clean_text().alias("clean"),
        F.col("text").text.word_count().alias("wc"),
        F.col("text").text.sentence_count().alias("sc"),
        F.col("text").text.tokenize(model="native:plain_words_en").alias("toks"),
        F.col("text").text.concordance("one").alias("conc"),
    ).first()
    assert row.clean == "hello world one two"
    assert row.wc == 4 and row.sc == 3
    assert [t.token for t in row.toks] == ["hello", "world", "one", "two"]
    assert len(row.conc) == 1 and row.conc[0].matched_text == "One"
