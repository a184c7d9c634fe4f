"""Property-based test: dup_ngram_coverage vs a naive Python oracle.

Mirrors the repo's property-test strategy (tokenize suite): the
distributed implementation is checked against a deliberately-naive
single-machine oracle over randomized corpora. A tiny vocabulary
forces heavy gram collisions, exercising min_df, self-repetition and
interval merging far harder than the parquet corpus does.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from polars_text_spark.operators.spans import dup_ngram_coverage

VOCAB = ["a", "b", "c", "d", "e"]
N = 3
MIN_DF = 2

corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


def naive_coverage(docs: list[list[str]]):
    """Obviously-correct oracle: count gram occurrences corpus-wide,
    then per-doc union the [start, start+N) intervals of duplicated
    grams."""
    grams: dict[tuple[str, ...], int] = {}
    per_doc = []
    for toks in docs:
        starts = []
        for i in range(max(len(toks) - N + 1, 0)):
            g = tuple(toks[i : i + N])
            grams[g] = grams.get(g, 0) + 1
            starts.append((i, g))
        per_doc.append((toks, starts))
    out = []
    for toks, starts in per_doc:
        dup = [(i, g) for i, g in starts if grams[g] >= MIN_DF]
        covered: set[int] = set()
        for i, _ in dup:
            covered.update(range(i, i + N))
        out.append(
            {
                "n_tokens": len(toks),
                "n_grams": max(len(toks) - N + 1, 0),
                "n_dup_grams": len(dup),
                "dup_tokens": len(covered),
            }
        )
    return out


@settings(max_examples=12, deadline=None)
@given(corpus_strategy)
def test_coverage_matches_naive_oracle(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dup_ngram_coverage(df, n=N, min_df=MIN_DF).collect()
    }
    want = naive_coverage(docs)
    assert len(got) == len(docs)
    for i, w in enumerate(want):
        g = got[i]
        for k in ("n_tokens", "n_grams", "n_dup_grams", "dup_tokens"):
            assert g[k] == w[k], (k, i, docs)
        expect_frac = (
            round(w["dup_tokens"] / w["n_tokens"], 6) if w["n_tokens"] else 0.0
        )
        assert abs(g["dup_frac"] - expect_frac) < 1e-9
