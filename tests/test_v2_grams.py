"""Round-14 v2 token-hash-window gram family: equivalence with the
string-gram family on every derived COUNT/TEXT output, and the
let-binding discipline pinned structurally (the O(G^2) re-inline trap
— SCALING.md round-13/14)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.dedup import sha_token_hash, v2_gram_hashes

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "a completely different document with its own unique words"),
    (4, "short doc"),
    (5, ""),
    (6, None),
    (7, "the quick brown fox jumps over a SLEEPY dog again and again"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_let_binding_structure_is_pinned(spark):
    """The token-hash array must sit inside the `let` wrapper
    (transform(array(<value>), v -> body)[0]) — OUTSIDE the per-window
    lambda. Without the binding the transform(toks, xxhash64) subtree
    lands inside the window lambda and is re-evaluated per window
    (measured 3x at sf0.1 x10, SCALING.md round-13). Pinned on the
    unresolved expression string: exactly ONE token-hash transform,
    wrapped as the let value."""
    expr = str(v2_gram_hashes(F.split(F.col("text"), " "), 3))
    # the let wrapper: transform(array(transform(<tokens>, _ -> xxhash64...
    assert "transform(array(transform(" in expr, expr
    # the token-hash transform is the let VALUE — everything before the
    # window lambda's own hash call contains exactly ONE xxhash64 (the
    # per-token pass); a re-inlined form would repeat it per window ref
    head = expr.split("xxhash64(element_at", 1)[0]
    assert head.count("xxhash64") == 1, (
        "token-hash transform leaked inside the window lambda:\n" + expr
    )
    # and the window hashes reference the BOUND variable, not a fresh
    # token-hash subtree
    assert "xxhash64(element_at" in expr, expr


def test_winnow_v2_default_matches_sha_family_semantics(spark):
    """Winnowing overlap SEMANTICS (which doc pairs share >= m
    fingerprints is not family-independent, but the SIGMOD guarantee
    and the identical-doc case are): identical docs must pair under
    BOTH families, and every family keeps the w+k-1 guarantee pair."""
    from polars_text_spark.operators.winnow import winnow_overlap_pairs

    df = _df(spark)
    v2 = {
        (r.id_a, r.id_b)
        for r in winnow_overlap_pairs(df, k=3, w=2, min_shared=1).collect()
    }
    sha = {
        (r.id_a, r.id_b)
        for r in winnow_overlap_pairs(
            df, k=3, w=2, min_shared=1, gram_hash=sha_token_hash
        ).collect()
    }
    # identical docs (1,2) share EVERY fingerprint under any family
    assert (1, 2) in v2 and (1, 2) in sha
    # docs 1 and 7 share a >= w+k-1 token run -> guaranteed pair
    assert (1, 7) in v2 and (1, 7) in sha


def test_winnow_identical_docs_share_all_fingerprints_v2(spark):
    from polars_text_spark.operators.winnow import winnow_fingerprints

    rows = (
        _df(spark)
        .filter(F.col("doc_id").isin(1, 2))
        .select(winnow_fingerprints("text", k=3, w=2).alias("f"))
        .collect()
    )
    assert rows[0]["f"] == rows[1]["f"] and len(rows[0]["f"]) > 0


def test_span_coverage_v2_default_equals_sha_family(spark):
    """dup_ngram_coverage outputs are counts over gram identity —
    the v2 default must be row-identical to the sha string family."""
    from polars_text_spark.operators.spans import dup_ngram_coverage

    df = _df(spark)
    v2 = {
        tuple(r)
        for r in dup_ngram_coverage(df, n=3, min_df=2).collect()
    }
    sha = {
        tuple(r)
        for r in dup_ngram_coverage(
            df, n=3, min_df=2, gram_hash=sha_token_hash
        ).collect()
    }
    assert v2 == sha and len(v2) == len(DOCS)


def test_strip_spans_v2_default_equals_sha_family(spark):
    from polars_text_spark.operators.spans import strip_duplicate_spans

    df = _df(spark)
    v2 = {
        (r.doc_id, r.text)
        for r in strip_duplicate_spans(df, n=3, min_df=2).collect()
    }
    sha = {
        (r.doc_id, r.text)
        for r in strip_duplicate_spans(
            df, n=3, min_df=2, gram_hash=sha_token_hash
        ).collect()
    }
    assert v2 == sha
    # the identical pair's shared 3-grams are stripped from both
    stripped = dict(v2)
    assert stripped[1] == "" and stripped[2] == ""


def test_decontam_hashed_equals_string_family(spark):
    """ngram_contamination (hashed v2 join keys since round 14) must
    produce the same counts as a string-shingle replay."""
    from polars_text_spark.operators.decontam import (
        ngram_contamination,
        token_ngrams,
    )

    cand = _df(spark)
    bench = spark.createDataFrame(
        [(100, "fox jumps over the lazy dog")], "doc_id long, text string"
    )
    out = {
        tuple(r)
        for r in ngram_contamination(cand, bench, n=3).collect()
    }
    # string-family replay of the same join
    c = cand.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(token_ngrams(F.col("text"), 3)).alias("s")
    )
    b = (
        bench.select(
            F.col("doc_id").alias("bid"),
            F.explode(token_ngrams(F.col("text"), 3)).alias("s"),
        )
        .distinct()
    )
    rep = {
        tuple(r)
        for r in c.join(b, "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_shingles"),
            F.countDistinct("bid").alias("n_bench_docs"),
        )
        .collect()
    }
    assert out == rep and len(out) >= 2


def test_v2_short_doc_and_boundary_conventions(spark):
    """Short docs hash the whole joined run; boundary disambiguation:
    token-hash windows cannot confuse 'ab c' with 'a bc'."""
    df = spark.createDataFrame(
        [(1, "ab c x y z"), (2, "a bc x y z")], "doc_id long, text string"
    )
    from polars_text_spark.operators.spans import dup_ngram_coverage

    cov = {
        r.doc_id: r.n_dup_grams
        for r in dup_ngram_coverage(df, n=2, min_df=2).collect()
    }
    # "ab c" vs "a bc" 2-grams never collide; only the shared
    # "x y"/"y z" grams are duplicated
    assert cov == {1: 2, 2: 2}


# ---- hypothesis properties of the v2 family itself ------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_VOCAB = ["aa", "bb", "cc", "a", "b", "ab"]  # incl. boundary-trap tokens
_docs_strategy = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=10),
    min_size=1,
    max_size=6,
)


@settings(max_examples=12, deadline=None)
@given(_docs_strategy)
def test_v2_windows_define_gram_identity(spark, docs):
    """Property: two windows hash equal under v2 iff their TOKEN
    sequences are equal (checked exhaustively over the sample — the
    2^-64 collision stance means a violation here is a bug, not bad
    luck), and the positional array length is exactly
    max(n_tokens - n + 1, 0)."""
    n = 2
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        F.when(
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
            >= n,
            v2_gram_hashes(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"), n
            ),
        ).alias("g"),
    ).collect()
    by_id = {r.doc_id: r.g for r in out}
    window_to_hash: dict[tuple, int] = {}
    hash_to_window: dict[int, tuple] = {}
    for i, toks in enumerate(docs):
        # split('') on empty text yields [''] — mirror the raw-split
        # convention this test feeds v2_gram_hashes with
        eff = " ".join(toks).strip().lower().split(" ") if toks else [""]
        g = by_id[i]
        if len(eff) < n or (len(eff) == 1 and eff[0] == ""):
            if g is not None:
                assert len(g) == max(len(eff) - n + 1, 0)
            continue
        assert g is not None and len(g) == len(eff) - n + 1
        for j, h in enumerate(g):
            w = tuple(eff[j : j + n])
            if w in window_to_hash:
                assert window_to_hash[w] == h, (w, h)
            window_to_hash[w] = h
            if h in hash_to_window:
                assert hash_to_window[h] == w, (w, h)
            hash_to_window[h] = w


@settings(max_examples=12, deadline=None)
@given(_docs_strategy)
def test_v2_distinct_equals_token_shingles_family(spark, docs):
    """Property: array_distinct over the positional v2 gram hashes IS
    token_shingles(hashed=True)'s set for docs with >= n tokens — the
    'one family' claim (SHINGLE_HASH_VERSION covers both) pinned over
    random corpora."""
    from polars_text_spark.operators.dedup import token_shingles

    n = 3
    rows = [
        (i, " ".join(toks))
        for i, toks in enumerate(docs)
        if len(toks) >= n
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    out = df.select(
        F.array_sort(
            F.array_distinct(v2_gram_hashes(toks, n))
        ).alias("pos"),
        F.array_sort(token_shingles("text", n, hashed=True)).alias("sh"),
    ).collect()
    for r in out:
        assert r.pos == r.sh
