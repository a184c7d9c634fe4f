"""Property-based tests: round-7 linguistics/quality operators vs
naive Python oracles over randomized tiny-vocabulary corpora.

Same strategy as the spans/tokenize property suites: heavy collisions
from a 5-symbol vocabulary stress dedup, blocking completeness and
histogram math far harder than the parquet corpus does.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

corpus_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "ab", "ba"]), min_size=0, max_size=10),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(corpus_strategy)
def test_ngram_counts_match_naive(spark, docs):
    from polars_text_spark.operators.linguistics import ngram_counts

    n = 2
    naive = Counter()
    for toks in docs:
        for i in range(max(len(toks) - n + 1, 0)):
            naive[" ".join(toks[i : i + n])] += 1
    df = spark.createDataFrame([(" ".join(t),) for t in docs], "text string")
    got = {r["ngram"]: r["count"] for r in ngram_counts(df, n=n).collect()}
    assert got == dict(naive)


@settings(max_examples=10, deadline=None)
@given(corpus_strategy)
def test_collocation_pair_counts_match_naive(spark, docs):
    from polars_text_spark.operators.linguistics import collocations

    window = 2
    naive = Counter()
    for toks in docs:
        for i, a in enumerate(toks):
            for d in range(1, window + 1):
                if i + d < len(toks):
                    naive[(a, toks[i + d])] += 1
    df = spark.createDataFrame([(" ".join(t),) for t in docs], "text string")
    got = {
        (r["a"], r["b"]): r["pair_count"]
        for r in collocations(df, window=window, min_pair_count=1).collect()
    }
    assert got == dict(naive)


word_strategy = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=8
)


@settings(max_examples=10, deadline=None)
@given(word_strategy)
def test_vocab_spelling_blocking_complete_vs_brute_force(spark, words):
    """SymSpell deletion blocking must find EXACTLY the distance-1
    pairs the brute-force levenshtein scan finds."""
    from polars_text_spark.operators.linguistics import vocab_spelling_pairs

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    vocab = sorted(set(words))
    brute = {
        (a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if lev(a, b) == 1
    }
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = {
        (r["a"], r["b"])
        for r in vocab_spelling_pairs(df, min_count=1).collect()
    }
    assert got == brute


@settings(max_examples=10, deadline=None)
@given(corpus_strategy)
def test_char_entropy_matches_naive(spark, docs):
    from polars_text_spark.functions.analysis import char_entropy

    texts = [" ".join(t) for t in docs]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["e"] for r in df.select(char_entropy("text").alias("e")).collect()]
    for text, e in zip(texts, got):
        if not text:
            assert e == 0.0
            continue
        cnt = Counter(text)
        n = len(text)
        naive = -sum((c / n) * math.log2(c / n) for c in cnt.values())
        assert e == abs(naive) or abs(e - naive) < 1e-12
