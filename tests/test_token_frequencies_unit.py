"""Golden-value tests for token frequencies + statistics, matching the
reference's tests/test_token_frequencies.py but through the
distributed DataFrame API."""

from __future__ import annotations

import math

from polars_text_spark.operators.token_frequencies import (
    STATS_COLUMNS,
    token_frequencies,
    token_frequency_stats,
)

MODEL = "native:plain_words_en"


def _freq_dict(df):
    return {r.token: r["count"] for r in df.collect()}


def test_token_frequencies_golden(spark):
    docs = spark.createDataFrame(
        [(1, "Hello world"), (2, "Hello there")], ["id", "text"]
    )
    freqs = _freq_dict(token_frequencies(docs, "text", model=MODEL))
    assert freqs == {"hello": 2, "world": 1, "there": 1}


def test_token_frequencies_special_tokens(spark):
    docs = spark.createDataFrame([(1, "Hello, [UNK] ##sta Queensland")], ["id", "text"])
    freqs = _freq_dict(token_frequencies(docs, "text", model=MODEL))
    assert freqs == {"hello": 1, "sta": 1, "queensland": 1}


def test_token_frequencies_skips_blank_and_null(spark):
    docs = spark.createDataFrame(
        [(1, "word"), (2, "   "), (3, None)], ["id", "text"]
    )
    freqs = _freq_dict(token_frequencies(docs, "text", model=MODEL))
    assert freqs == {"word": 1}


def test_stats_columns_and_hand_computed_math(spark):
    """Column set per the reference; log-likelihood hand-checked for
    the reference's own tiny corpus (hello: f0=2 f1=1, totals 3/3)."""
    c0 = spark.createDataFrame(
        [("hello", 2), ("world", 1)], ["token", "count"]
    )
    c1 = spark.createDataFrame(
        [("hello", 1), ("there", 2)], ["token", "count"]
    )
    stats = token_frequency_stats(c0, c1)
    assert stats.columns == STATS_COLUMNS
    rows = {r.token: r for r in stats.collect()}
    assert set(rows) == {"hello", "world", "there"}

    h = rows["hello"]
    assert (h.freq_corpus_0, h.freq_corpus_1) == (2, 1)
    assert (h.corpus_0_total, h.corpus_1_total) == (3, 3)
    assert math.isclose(h.expected_0, 1.5) and math.isclose(h.expected_1, 1.5)
    want_ll = 2 * (2 * math.log(2 / 1.5) + 1 * math.log(1 / 1.5))
    assert math.isclose(h.log_likelihood_llv, want_ll, rel_tol=1e-12)
    assert math.isclose(h.bayes_factor_bic, want_ll - math.log(6), rel_tol=1e-12)
    assert h.significance == ""  # ll ~0.34 < 3.84
    assert math.isclose(h.relative_risk, 2.0)
    assert math.isclose(h.log_ratio, math.log(2.0))
    assert math.isclose(h.odds_ratio, (2 * 2) / (1 * 1))
    # percent_diff is a raw proportion difference (reference quirk)
    assert math.isclose(h.percent_diff, 2 / 3 - 1 / 3, rel_tol=1e-12)

    w = rows["world"]  # present only in corpus 0
    assert w.relative_risk is None and w.log_ratio is None and w.odds_ratio is None
    t = rows["there"]  # absent from corpus 0
    assert t.freq_corpus_0 == 0 and t.percent_corpus_0 == 0.0


def test_tokenizer_fertility_hand_case(spark):
    from polars_text_spark.operators.token_frequencies import (
        tokenizer_fertility,
    )

    df = spark.createDataFrame(
        [
            # "don't stop" -> ws words 2; native tokens: don, t, stop
            (1, "en", "don't stop"),
            (2, "en", "café ok"),  # é is 2 bytes in UTF-8
            (3, "xx", "   "),      # tokenizes to nothing
            (4, None, "x"),        # null group still aggregates
            (5, "en", None),       # null text dropped
        ],
        "id int, lang string, text string",
    )
    rows = {
        r.group: r
        for r in tokenizer_fertility(
            df, "text", "lang", model="native:plain_words_en"
        ).collect()
    }
    en = rows["en"]
    assert en.n_docs == 2 and en.n_words == 4
    assert en.n_tokens == 5  # don / t / stop / café / ok
    assert en.n_bytes == en.n_chars + 1  # the é
    assert en.fertility == 5 / 4
    # a group with zero tokens gets null ratios, not a crash
    xx = rows["xx"]
    assert xx.n_tokens == 0 and xx.fertility is None
    assert xx.chars_per_token is None
    assert rows[None].n_docs == 1


def test_tokenizer_fertility_no_explode_single_shuffle(spark, sf_dir):
    from polars_text_spark.operators.token_frequencies import (
        tokenizer_fertility,
    )
    from polars_text_spark.plans import explain_str

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tokenizer_fertility(docs, "text", "lang", model="native:plain_words_en")
    plan = explain_str(out, "formatted")
    import re

    assert "Generate" not in plan  # no explode of the token arrays
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1  # only the groupBy
