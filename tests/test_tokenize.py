"""Tokenizer tests — golden values and invariants from the reference's
tests/test_tokenize.py, tests/test_tokenize_with_offsets.py and
FIXTURES.md F2."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.functions import tokenize
from polars_text_spark.functions.tokenize import (
    plain_word_records,
    tokenize_plain_text,
)


def test_plain_word_records_pure():
    # BertPreTokenizer-equivalent: punct isolated, words kept
    recs = plain_word_records("hello, world!", remove_punct=True)
    assert [r[0] for r in recs] == ["hello", "world"]
    recs = plain_word_records("hello, world!", remove_punct=False)
    assert [r[0] for r in recs] == ["hello", ",", "world", "!"]


def test_special_tokens_dropped_pure():
    toks = tokenize_plain_text("[CLS] hello [SEP] [PAD] [UNK]", True, True)
    assert toks == ["hello"]
    toks = tokenize_plain_text("Hello, [UNK] ##sta Queensland", True, True)
    assert toks == ["hello", "sta", "queensland"]


def test_tokenize_offsets_reconstruct(spark):
    rows = [
        (1, "Hello, world!"),
        (2, "Tokenization happens fast"),
        (3, ""),
        (4, None),
        (5, "hi 🙂 there 👋 friend"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = (
        df.select("id", "text", tokenize("text", model="native:plain_words_en"))
        .orderBy("id")
        .collect()
    )
    by_id = {r.id: r for r in out}
    # null/empty -> empty list, never null (src/expressions.rs:834-840)
    assert by_id[3].tokens == []
    assert by_id[4].tokens == []
    assert [t.token for t in by_id[1].tokens] == ["hello", "world"]
    # offsets reconstruct the lowercased source text (char slicing)
    for r in out:
        if r.text is None:
            continue
        lowered = r.text.lower()
        prev_end = 0
        for t in r.tokens:
            assert lowered[t.start : t.end] == t.token
            assert t.start >= prev_end and t.end > t.start
            prev_end = t.end


def test_tokenize_keep_punct(spark):
    df = spark.createDataFrame([(1, "Hello, world!")], ["id", "text"])
    row = df.select(
        tokenize("text", model="native:plain_words_en", remove_punct=False)
    ).first()
    assert [t.token for t in row.tokens] == ["hello", ",", "world", "!"]


def test_unknown_model_rejected():
    with pytest.raises(ValueError):
        tokenize("text", model="bert-base-uncased")  # unprefixed id
    with pytest.raises(ValueError):
        tokenize("text", model="  ")


def test_pushdown_past_tokenize(spark, sf_dir):
    """Predicate pushdown must survive the pandas UDF (the behavior the
    reference's is_elementwise=True buys, tests/test_tokenize_cache.py:65-84)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.select(
        "doc_id", "lang", tokenize("text", model="native:plain_words_en")
    ).filter(F.col("lang") == "en")
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
