"""Sequence packing + unigram surprisal: placement math on known
streams; surprisal against hand-computed distributions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.packing import (
    pack_sequences,
    sequence_manifest,
)
from polars_text_spark.operators.quality import (
    unigram_frequencies,
    unigram_surprisal,
)


def test_pack_single_stream(spark):
    # Stream: 4, 5, 3, 10 tokens; budget 8.
    docs = spark.createDataFrame(
        [(1, 4), (2, 5), (3, 3), (4, 10)], "doc_id long, tok long"
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, "tok", 8, order_col="doc_id").collect()
    }
    # doc1: [0,4)   -> seq 0 only
    assert (out[1].stream_start, out[1].first_seq, out[1].last_seq) == (0, 0, 0)
    assert (out[1].n_seqs, out[1].seq_offset) == (1, 0)
    # doc2: [4,9)   -> crosses seq 0/1 boundary
    assert (out[2].first_seq, out[2].last_seq, out[2].n_seqs) == (0, 1, 2)
    assert out[2].seq_offset == 4
    # doc3: [9,12)  -> seq 1
    assert (out[3].first_seq, out[3].last_seq, out[3].n_seqs) == (1, 1, 1)
    # doc4: [12,22) -> seqs 1..2
    assert (out[4].first_seq, out[4].last_seq, out[4].n_seqs) == (1, 2, 2)
    assert out[4].seq_offset == 4


def test_pack_sharded_streams_independent(spark):
    docs = spark.createDataFrame(
        [(1, "a", 6), (2, "b", 6), (3, "a", 6), (4, "b", 6)],
        "doc_id long, shard string, tok long",
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(
            docs, "tok", 8, order_col="doc_id", shard_col="shard"
        ).collect()
    }
    # Each shard restarts its stream at 0.
    assert out[1].stream_start == 0 and out[2].stream_start == 0
    assert out[3].stream_start == 6 and out[4].stream_start == 6
    assert out[3].n_seqs == 2  # [6,12) crosses the shard-local boundary


def test_pack_zero_token_doc(spark):
    docs = spark.createDataFrame(
        [(1, 8), (2, 0), (3, 4)], "doc_id long, tok long"
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, "tok", 8, order_col="doc_id").collect()
    }
    assert (out[2].n_seqs, out[2].first_seq, out[2].last_seq) == (0, 1, 1)
    assert out[3].stream_start == 8  # empty doc consumed no stream


def test_pack_budget_validation(spark):
    docs = spark.createDataFrame([(1, 4)], "doc_id long, tok long")
    with pytest.raises(ValueError):
        pack_sequences(docs, "tok", 0, order_col="doc_id")


def test_sequence_manifest_slices(spark):
    docs = spark.createDataFrame(
        [(1, 4), (2, 5), (3, 3), (4, 10), (5, 0)], "doc_id long, tok long"
    )
    packed = pack_sequences(docs, "tok", 8, order_col="doc_id")
    man = sequence_manifest(packed, "tok", 8).collect()
    got = sorted((r.doc_id, r.seq_id, r.seq_pos, r.doc_tok_start, r.slice_len)
                 for r in man)
    assert got == [
        (1, 0, 0, 0, 4),
        (2, 0, 4, 0, 4), (2, 1, 0, 4, 1),
        (3, 1, 1, 0, 3),
        (4, 1, 4, 0, 4), (4, 2, 0, 4, 6),
    ]  # doc5 (0 tokens) emits nothing
    # invariants: slices cover each doc exactly; no sequence overflows
    by_doc = {}
    by_seq = {}
    for d, s, _, _, ln in got:
        by_doc[d] = by_doc.get(d, 0) + ln
        by_seq[s] = by_seq.get(s, 0) + ln
    assert by_doc == {1: 4, 2: 5, 3: 3, 4: 10}
    assert all(v <= 8 for v in by_seq.values())
    # every fully-interior sequence is exactly full
    assert by_seq[0] == 8 and by_seq[1] == 8


def test_unigram_surprisal_self(spark):
    # Corpus: "a a b" / "b" -> counts a:2 b:2, total 4; p=0.5 each.
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_surprisal(docs).collect()}
    assert out[1].n_tokens == 3 and out[2].n_tokens == 1
    assert out[1].avg_surprisal == pytest.approx(1.0)
    assert out[2].avg_surprisal == pytest.approx(1.0)


def test_unigram_surprisal_external_freq_with_smoothing(spark):
    ref = spark.createDataFrame(
        [(1, "x x x y")], "doc_id long, text string"
    )
    freq = unigram_frequencies(ref)  # x:3 y:1, total 4
    docs = spark.createDataFrame(
        [(1, "x y z")], "doc_id long, text string"
    )
    out = unigram_surprisal(docs, freq_df=freq).collect()[0]
    # z unseen -> +1-smoothed count over the SAME total: -log2(1/4).
    expect = (-math.log2(3 / 4) - math.log2(1 / 4) - math.log2(1 / 4)) / 3
    assert out.avg_surprisal == pytest.approx(expect)


def test_bigram_surprisal_hand_computed(spark):
    from polars_text_spark.operators.quality import bigram_surprisal

    # Corpus: "a b a b" / "a c" / "solo". Bigrams: (a,b):2 (b,a):1
    # (a,c):1. Left totals: a:3 b:1. V = 4 (a, b, c, solo — vocabulary
    # counts ALL corpus tokens, including from bigram-less docs).
    # alpha=1:
    #   P(b|a) = (2+1)/(3+4) = 3/7    P(a|b) = (1+1)/(1+4) = 2/5
    #   P(c|a) = (1+1)/(3+4) = 2/7
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo"), (4, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_surprisal(docs).collect()}
    # docs with < 2 tokens are absent
    assert set(out) == {1, 2}
    assert out[1].n_bigrams == 3 and out[2].n_bigrams == 1
    expect1 = (-math.log2(3 / 7) * 2 - math.log2(2 / 5)) / 3
    assert out[1].avg_surprisal == pytest.approx(expect1)
    assert out[2].avg_surprisal == pytest.approx(-math.log2(2 / 7))


def test_bigram_surprisal_flags_incoherent_sequences(spark):
    from polars_text_spark.operators.quality import bigram_surprisal

    # same unigram content, different pair coherence: doc 3 shuffles
    # word order so its bigrams are all singletons
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "mat the on cat the sat"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_surprisal(docs).collect()}
    assert out[3].avg_surprisal > out[1].avg_surprisal


def test_unigram_frequencies_counts(spark):
    docs = spark.createDataFrame(
        [(1, "  Foo  bar FOO "), (2, None)], "doc_id long, text string"
    )
    got = {r.token: r.cnt for r in unigram_frequencies(docs).collect()}
    assert got == {"foo": 2, "bar": 1}


# ---- vocab coverage / OOV ------------------------------------------------


def test_vocab_topk_order_and_cutoff(spark):
    from polars_text_spark.operators.quality import vocab_topk

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b a d")], "doc_id long, text string"
    )
    rows = vocab_topk(docs, "text", k=3).orderBy("rank").collect()
    # counts: a=4, b=3, c=1, d=1 -> tie c/d broken alphabetically
    assert [(r.token, r.cnt, r.rank) for r in rows] == [
        ("a", 4, 1),
        ("b", 3, 2),
        ("c", 1, 3),
    ]


def test_oov_rate_hand_computed(spark):
    from polars_text_spark.operators.quality import oov_rate

    docs = spark.createDataFrame(
        [(1, "a a b x"), (2, "x y"), (3, None)],
        "doc_id long, text string",
    )
    # corpus counts: a=2, x=2, b=1, y=1 -> vocab k=2 = {a, x}
    # (a beats x alphabetically at cnt 2)
    out = {r.doc_id: r for r in oov_rate(docs, "text", "doc_id", k=2).collect()}
    assert set(out) == {1, 2}  # null-text doc absent
    assert (out[1].n_tokens, out[1].n_oov) == (4, 1)  # b is OOV
    assert out[1].oov_rate == pytest.approx(0.25)
    assert (out[2].n_tokens, out[2].n_oov) == (2, 1)  # y is OOV
    assert out[2].oov_rate == pytest.approx(0.5)


def test_oov_rate_external_vocab(spark):
    from polars_text_spark.operators.quality import oov_rate

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    vocab = spark.createDataFrame([("a",), ("z",)], "token string")
    (row,) = oov_rate(docs, "text", "doc_id", vocab_df=vocab).collect()
    assert (row.n_tokens, row.n_oov) == (3, 2)


# ---- source KL divergence ------------------------------------------------


def test_source_kl_zero_for_identical_distributions(spark):
    from polars_text_spark.operators.quality import source_kl_divergence

    docs = spark.createDataFrame(
        [("s1", "a a b"), ("s2", "a a b")], "source string, text string"
    )
    rows = source_kl_divergence(docs, "text", "source").collect()
    for r in rows:
        assert r.kl_bits == pytest.approx(0.0, abs=1e-12)


def test_source_kl_hand_computed(spark):
    from polars_text_spark.operators.quality import source_kl_divergence

    # s1: {a:2} P=(1,0); s2: {a:1, b:1} P=(.5,.5)
    # corpus Q: a=3/4, b=1/4
    docs = spark.createDataFrame(
        [("s1", "a a"), ("s2", "a b")], "source string, text string"
    )
    out = {
        r.source: r
        for r in source_kl_divergence(docs, "text", "source").collect()
    }
    kl1 = 1.0 * math.log2(1.0 / 0.75)
    kl2 = 0.5 * math.log2(0.5 / 0.75) + 0.5 * math.log2(0.5 / 0.25)
    assert out["s1"].kl_bits == pytest.approx(kl1)
    assert out["s2"].kl_bits == pytest.approx(kl2)
    assert out["s1"].n_tokens == 2 and out["s2"].n_tokens == 2


# ---- Zipf slope ----------------------------------------------------------


def test_zipf_slope_exact_power_law(spark):
    from polars_text_spark.operators.quality import zipf_slope_by

    # counts 12,6,4,3 at ranks 1..4: log2(cnt) = log2(12) - log2(rank)
    # exactly (cnt = 12 / rank), so OLS recovers slope -1.
    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (row,) = zipf_slope_by(docs, "text").collect()
    assert row.n_types == 4
    assert row.zipf_slope == pytest.approx(-1.0, abs=1e-9)
    assert row.zipf_intercept == pytest.approx(math.log2(12.0), abs=1e-9)


def test_zipf_slope_grouped_and_topn(spark):
    from polars_text_spark.operators.quality import zipf_slope_by

    docs = spark.createDataFrame(
        [("en", "a a b"), ("de", "x x x x y y z w")],
        "lang string, text string",
    )
    out = {
        r.lang: r
        for r in zipf_slope_by(docs, "text", "lang", top_n=2).collect()
    }
    assert out["en"].n_types == 2 and out["de"].n_types == 2


# ---- mixture rebalance ---------------------------------------------------


def test_mixture_rates_formula():
    from polars_text_spark.operators.sampling import mixture_rates

    # en most under-represented vs its weight -> kept whole.
    rates = mixture_rates({"en": 100, "de": 300}, {"en": 0.5, "de": 0.5})
    assert rates["en"] == 1.0
    assert rates["de"] == pytest.approx(100 / 300)
    with pytest.raises(ValueError):
        mixture_rates({"en": 10}, {"en": 0.0})
    with pytest.raises(ValueError):
        mixture_rates({"en": 10}, {"fr": 1.0})


def test_mixture_rebalance_composition_and_determinism(spark):
    from polars_text_spark.operators.sampling import mixture_rebalance

    rows = [(i, "major" if i % 4 else "minor") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = mixture_rebalance(df, {"major": 0.5, "minor": 0.5}, "stratum", "doc_id")
    counts = {r[0]: r[1] for r in out.groupBy("stratum").count().collect()}
    # minor (100 rows) binds -> kept whole; major sampled ~100 of 300.
    assert counts["minor"] == 100
    assert 70 <= counts["major"] <= 130
    # Deterministic: identical selection on rerun.
    ids1 = sorted(r.doc_id for r in out.collect())
    out2 = mixture_rebalance(df, {"major": 0.5, "minor": 0.5}, "stratum", "doc_id")
    ids2 = sorted(r.doc_id for r in out2.collect())
    assert ids1 == ids2


# ---- round-9 plan assertions: no corpus-scale single-task windows --------


def test_source_kl_plan_has_no_unpartitioned_window(spark):
    """The corpus total must be a broadcast 1-row crossJoin, never a
    ``Window.partitionBy()`` sum (one task would sort the whole
    |groups|x|vocab| frame). An unpartitioned UNORDERED window prints
    ``windowspecdefinition(specifiedwindowframe(...``; partitioned
    ones name their key first."""
    from polars_text_spark.operators.quality import source_kl_divergence
    from polars_text_spark.plans import explain_str

    docs = spark.createDataFrame(
        [("s1", "a a"), ("s2", "a b")], "source string, text string"
    )
    plan = explain_str(source_kl_divergence(docs, "text", "source"), "formatted")
    assert "windowspecdefinition(specifiedwindowframe" not in plan
    # the per-group and per-token windows must still be there
    assert plan.count(") Window") == 2
    # and the total arrives via a broadcast join of the 1-row aggregate
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_vocab_topk_two_phase_plan_and_equivalence(spark):
    """Phase-1 ranking must be partitioned by the hash-bucket column
    (parallel sort) with Spark's rank-limit pushdown applied; the
    result must equal the naive single-window top-k."""
    from polars_text_spark.operators.quality import (
        unigram_frequencies,
        vocab_topk,
    )
    from polars_text_spark.plans import explain_str
    from pyspark.sql import Window

    rows = [(i, f"tok{i % 97} tok{i % 31} common") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = vocab_topk(docs, "text", k=25)
    plan = explain_str(out, "formatted")
    assert "__tpk_b" in plan  # bucketed phase-1 window present
    # Spark >= 3.5 pushes rank<=k into WindowGroupLimit partials
    assert "WindowGroupLimit" in plan
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    naive = (
        unigram_frequencies(docs, "text")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 25)
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_heavy_hitters_two_phase_matches_naive_rank(spark):
    from polars_text_spark.operators.quality import heavy_hitters_audit

    rows = [(i, " ".join(f"w{j}" for j in range(i % 7))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = heavy_hitters_audit(docs, "text", k=4, depth=4, width=4096).collect()
    # w0 appears in every doc with >=1 token etc. -> counts strictly
    # decreasing w0 > w1 > ... so ranks are unambiguous
    assert [r.token for r in sorted(got, key=lambda r: r.rank)] == [
        "w0",
        "w1",
        "w2",
        "w3",
    ]
    for r in got:
        assert r.cms_est >= r.exact_count


def test_language_consistency_hand_cases(spark):
    from polars_text_spark.operators.quality import language_consistency

    docs = spark.createDataFrame(
        [
            # 2 en segments + 1 fr -> dominant en, consistency 2/3
            (1, "the cat is a pet\nit was the end of it\nle la les et est"),
            # pure single segment
            (2, "der und die das ist"),
            # tie 1:1 -> alphabetical winner (de < en)
            (3, "der und die das ist nicht\nthe of and to is it"),
            (4, None),
            (5, "   \n  "),  # blank segments only -> absent
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in language_consistency(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].dominant_lang == "en" and out[1].n_segments == 3
    assert out[1].n_langs == 2
    assert out[1].consistency == pytest.approx(2 / 3)
    assert out[2].dominant_lang == "de" and out[2].consistency == 1.0
    assert out[3].dominant_lang == "de"  # tie -> alphabetical
    assert out[3].consistency == pytest.approx(0.5)


def test_language_consistency_sep_is_literal(spark):
    """sep is documented as a LITERAL separator: '|' (a regex
    metachar) must split on pipes, not between every character."""
    from polars_text_spark.operators.quality import language_consistency

    docs = spark.createDataFrame(
        [(1, "the cat is a pet|it was the end of it|le la les et est")],
        "doc_id long, text string",
    )
    out = language_consistency(docs, sep="|").collect()[0]
    assert out.n_segments == 3
    assert out.dominant_lang == "en"
    assert out.consistency == pytest.approx(2 / 3)
    # '.' would previously split between every character too
    dotted = spark.createDataFrame(
        [(1, "der und die das ist.the of and to is it")],
        "doc_id long, text string",
    )
    row = language_consistency(dotted, sep=".").collect()[0]
    assert row.n_segments == 2


def test_language_consistency_no_global_window(spark):
    """The ranking windows must be partitioned by the doc id — never a
    corpus-wide single task."""
    from polars_text_spark.operators.quality import language_consistency
    from polars_text_spark.plans import explain_str

    docs = spark.createDataFrame(
        [(1, "a\nb")], "doc_id long, text string"
    )
    plan = explain_str(language_consistency(docs), "formatted")
    assert "windowspecdefinition(specifiedwindowframe" not in plan


def test_quantile_buckets_hand_cases(spark):
    from polars_text_spark.operators.quality import quantile_buckets

    df = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(9)]
        + [(100 + i, "fr", float(i % 2)) for i in range(4)]
        + [(200, "de", None), (201, None, 1.0)],
        "doc_id long, lang string, v double",
    )
    got = {
        r.doc_id: r.bucket
        for r in quantile_buckets(df, "v", "lang").collect()
    }
    # en: 9 evenly spread values -> exact terciles
    assert [got[i] for i in range(9)] == [0, 0, 0, 1, 1, 1, 2, 2, 2]
    # fr: binary values, ties share a bucket (discrete quantiles)
    assert got[100] == got[102] == 0 and got[101] == got[103] == 1
    # null value and null-group rows get a NULL bucket, never top
    assert got[200] is None and got[201] is None
    # corpus-wide (by=None) and parameter guard
    flat = {
        r.doc_id: r.bucket
        for r in quantile_buckets(
            df.filter("v IS NOT NULL AND lang = 'en'"), "v", n_buckets=2
        ).collect()
    }
    assert [flat[i] for i in range(9)] == [0, 0, 0, 0, 0, 1, 1, 1, 1]
    with pytest.raises(ValueError, match="n_buckets"):
        quantile_buckets(df, "v", n_buckets=1)


def test_quantile_buckets_windows_run_over_histogram(spark):
    """The cumulative window must consume the aggregated value
    histogram (distinct values), never the row stream — the plan
    shows the Window above a HashAggregate, and the threshold join
    back to the rows is a broadcast."""
    from polars_text_spark.operators.quality import quantile_buckets
    from polars_text_spark.plans import explain_str

    df = spark.createDataFrame(
        [(i, "en", float(i % 7)) for i in range(50)],
        "doc_id long, lang string, v double",
    )
    plan = explain_str(quantile_buckets(df, "v", "lang"), "formatted")
    assert "Window" in plan and "BroadcastHashJoin" in plan
    tree = plan.split("\n\n")[0].splitlines()
    w = next(i for i, l in enumerate(tree) if "Window" in l)
    assert any("HashAggregate" in l for l in tree[w:]), plan


def test_trigram_surprisal_hand_computed(spark):
    """Interpolated probability replayed by hand on a 2-doc corpus."""
    import math

    from polars_text_spark.operators.quality import (
        trigram_interpolated_surprisal,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in trigram_interpolated_surprisal(docs).collect()
    }
    # doc 2 has < 3 tokens -> absent
    assert set(out) == {1}
    # corpus trigrams: (a,b,c) x2, (b,c,a), (c,a,b) — N=4
    # legs: C(ab.)=2 C(bc.)=1 C(ca.)=1; C(bc)=2 C(ca)=1 C(ab)=1;
    #       C(b.)=2 C(c.)=1 C(a.)=1; C(c)=2 C(a)=1 C(b)=1
    def p(c3, c12, c23, c2, c3u):
        return 0.6 * (c3 / c12) + 0.3 * (c23 / c2) + 0.1 * (c3u / 4.0)

    probs = [
        p(2, 2, 2, 2, 2),  # a b c (x2)
        p(2, 2, 2, 2, 2),
        p(1, 1, 1, 1, 1),  # b c a
        p(1, 1, 1, 1, 1),  # c a b
    ]
    want = sum(-math.log2(x) for x in probs) / 4
    assert out[1].n_trigrams == 4
    assert abs(out[1].avg_surprisal - want) < 1e-9


def test_trigram_surprisal_lambda_validation(spark):
    import pytest as _pytest

    from polars_text_spark.operators.quality import (
        trigram_interpolated_surprisal,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="sum to 1"):
        trigram_interpolated_surprisal(df, lambdas=(0.5, 0.5, 0.5))


# ---------------------------------------------------------------------------
# Round 13 (ADVICE r12): cross-corpus trigram scoring with OOV backoff.
# ---------------------------------------------------------------------------


def test_trigram_backoff_hand_computed(spark):
    """Fit on one doc, score a doc with known AND unknown trigrams:
    the unknown trigram must get exactly l1 * 1/N (the unigram floor),
    partially-known legs coalesce to 0, and the coverage accounting
    matches by hand."""
    from polars_text_spark.operators.quality import (
        fit_trigram_lm,
        score_trigram_lm,
    )

    fit = spark.createDataFrame([(1, "a b c a b c")], "doc_id long, text string")
    # fit trigrams: (a,b,c) x2, (b,c,a), (c,a,b) -> N=4
    model = fit_trigram_lm(fit, "text")
    score = spark.createDataFrame(
        [(2, "a b c"), (3, "x y z")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in score_trigram_lm(
            score, model, "text", "doc_id",
            lambdas=(0.6, 0.3, 0.1), oov="backoff",
        ).collect()
    }
    # doc 2: (a,b,c) fully known — c3=2, C(a,b)=2, C(b,c)=2,
    # C(.b.)=2 (only (a,b,c) has middle b), C(c)=2, N=4:
    # p = .6*(2/2) + .3*(2/2) + .1*(2/4)
    p_known = 0.6 * 1.0 + 0.3 * 1.0 + 0.1 * (2 / 4)
    assert out[2].n_trigrams == 1 and out[2].n_unknown == 0
    assert out[2].coverage == 1.0
    assert math.isclose(out[2].avg_surprisal, -math.log2(p_known))
    # doc 3: (x,y,z) fully unknown — p = .1 * 1/4 (the floor)
    assert out[3].n_trigrams == 1 and out[3].n_unknown == 1
    assert out[3].coverage == 0.0
    assert math.isclose(out[3].avg_surprisal, -math.log2(0.1 * 0.25))


def test_trigram_backoff_keeps_oov_heavy_docs(spark):
    """The drop mode loses the exact docs a quality filter targets —
    backoff must keep them, with HIGHER surprisal than in-model docs."""
    from polars_text_spark.operators.quality import (
        fit_trigram_lm,
        score_trigram_lm,
    )

    fit = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    model = fit_trigram_lm(fit, "text")
    score = spark.createDataFrame(
        [(2, "the quick brown fox"), (3, "zzz qqq vvv kkk www")],
        "doc_id long, text string",
    )
    dropped = {
        r.doc_id
        for r in score_trigram_lm(score, model, oov="drop").collect()
    }
    assert 3 not in dropped  # the junk doc vanishes under drop
    kept = {
        r.doc_id: r
        for r in score_trigram_lm(score, model, oov="backoff").collect()
    }
    assert set(kept) == {2, 3}
    assert kept[3].avg_surprisal > kept[2].avg_surprisal
    assert kept[3].coverage == 0.0 and kept[2].coverage == 1.0


def test_trigram_backoff_validates_floor_and_mode(spark):
    from polars_text_spark.operators.quality import (
        fit_trigram_lm,
        score_trigram_lm,
    )

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    model = fit_trigram_lm(df, "text")
    with pytest.raises(ValueError, match="unigram floor"):
        score_trigram_lm(df, model, lambdas=(0.7, 0.3, 0.0), oov="backoff")
    with pytest.raises(ValueError, match="oov"):
        score_trigram_lm(df, model, oov="bogus")
