"""Corpus-relative quality signals for training-data curation.

:func:`polars_text_spark.functions.analysis.quality_score` is
doc-LOCAL (length/punct/stopword ratios). The strongest cheap quality
signal real pipelines add next is corpus-RELATIVE: how surprising a
document's tokens are under the corpus's own unigram distribution
(the zero-dependency stand-in for a KenLM perplexity filter —
gibberish and boilerplate both land in the tails). Everything here is
pure Catalyst: explode → two hash aggregations → one equi-join on
token — no UDF, no driver materialization.

Scale notes (100 TB):
- The vocabulary frame is NOT broadcast: a web-scale corpus has an
  unbounded long tail, so token→count joins shuffle on the token key
  (AQE handles the Zipf skew on stop-tokens; they hash-split fine
  because the join is 1:N, not N:N).
- The corpus total is a 1-row aggregate cross-joined in — a broadcast
  of 8 bytes, not a driver collect.
- Self-scoring (freq table built from the scored corpus itself) is
  one pass; to score a shard against a REFERENCE corpus distribution,
  pass ``freq_df`` (e.g. read from a saved parquet of a previous run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bigram_surprisal",
    "language_consistency",
    "cardinality_report",
    "doc_bigrams",
    "doc_trigrams",
    "fit_trigram_lm",
    "score_trigram_lm",
    "trigram_interpolated_surprisal",
    "doc_ngram_novelty",
    "heaps_law_fit",
    "heavy_hitters_audit",
    "length_outlier_report",
    "quantile_buckets",
    "quantile_sketch_audit",
    "oov_rate",
    "source_kl_divergence",
    "unigram_frequencies",
    "unigram_surprisal",
    "vocab_topk",
    "zipf_slope_by",
]


def _ws_tokens(text_col: str):
    # the shared portable contract — one definition repo-wide
    from polars_text_spark.functions.analysis import ws_token_array

    return ws_token_array(text_col)


def _java_regex_quote(s: str) -> str:
    """Java ``Pattern.quote`` semantics: wrap in ``\\Q..\\E``, escaping
    any embedded ``\\E`` so a caller-supplied literal separator can
    never be misread as a regex by ``F.split``."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def unigram_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-token unigram counts: ``(token, cnt)``. One explode
    + one groupBy shuffle; save as parquet to reuse as a reference
    distribution across runs."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(_ws_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    freq_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean token surprisal in bits:
    ``mean(-log2(cnt(token) / corpus_total))`` over the doc's
    whitespace tokens (occurrence-weighted).

    ``freq_df`` (``token, cnt`` as from :func:`unigram_frequencies`)
    scores against an external distribution; tokens unseen there get
    a +1-smoothed count so the surprisal stays finite. Default is
    self-scoring, where every token is present by construction.

    Returns ``(id_col, n_tokens, avg_surprisal)``; docs with no
    tokens are absent (no distribution to score against).
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        id_col, F.explode(_ws_tokens(text_col)).alias("token")
    )
    if freq_df is not None:
        freq = freq_df
    else:
        # Self-scoring builds the vocab once and persists it (released
        # via polars_text_spark.persist): without the pin, the total's
        # aggregate re-derives the freq subtree and the corpus gets a
        # THIRD full scan. The vocab frame is ~|vocab| rows — small
        # relative to the corpus at any scale.
        from polars_text_spark.persist import track_persist

        freq = track_persist(unigram_frequencies(df, text_col).persist())
    total = freq.agg(F.sum("cnt").cast("double").alias("__total"))
    scored = (
        toks.join(freq, "token", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (-F.log2(F.coalesce(F.col("cnt"), F.lit(1)) / F.col("__total"))).alias(
                "__bits"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.avg("__bits").alias("avg_surprisal"),
    )


def doc_bigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Ordered whitespace-token bigrams: ``(id, w1, w2)`` — one row
    per adjacent token pair; docs with < 2 tokens contribute nothing.
    explode_outer + null filter (the InferFiltersFromGenerate rule,
    SCALING.md) so the pair array builds once per row."""
    toks = _ws_tokens(text_col)
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__bg_id"), F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(
            F.col("__bg_id").alias(id_col),
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
        )
    )


def bigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document mean CONDITIONAL surprisal in bits under the
    corpus's own bigram model — one Markov order up from
    :func:`unigram_surprisal`, the zero-dependency stand-in for the
    KenLM perplexity filters of CCNet-class pipelines:

    ``mean(-log2((C(w1,w2) + alpha) / (C(w1,·) + alpha·V)))``

    with add-``alpha`` smoothing over vocabulary size ``V`` (distinct
    corpus tokens). High values flag incoherent token sequences that
    unigram statistics cannot see (every word common, no word pair).

    Returns ``(id_col, n_bigrams, avg_surprisal)``; docs with < 2
    tokens are absent (no bigram to score).

    Scale: the LM is two aggregates over the exploded pair stream —
    bigram counts (shuffled on (w1, w2)), then left-context totals
    derived from the COUNTS frame (|bigram types| rows, never a second
    corpus pass). V and the pair stream's join against the counts
    shuffle on token keys; a web-scale bigram table is deliberately
    not broadcast.
    """
    bg = doc_bigrams(df, text_col, id_col)
    from polars_text_spark.persist import track_persist

    counts = track_persist(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c")).persist()
    )
    left = counts.groupBy("w1").agg(F.sum("__c").alias("__lc"))
    vocab = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(_ws_tokens(text_col)).alias("t"))
        .agg(F.countDistinct("t").cast("double").alias("__v"))
    )
    bits = -F.log2(
        (F.col("__c") + F.lit(float(alpha)))
        / (F.col("__lc") + F.lit(float(alpha)) * F.col("__v"))
    )
    return (
        bg.join(counts, ["w1", "w2"])
        .join(left, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(id_col, bits.alias("__bits"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("__bits").alias("avg_surprisal"),
        )
    )


def doc_trigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Ordered whitespace-token trigrams: ``(id, w1, w2, w3)`` — one
    row per adjacent triple; docs with < 3 tokens contribute nothing.
    Same single-array-build explode shape as :func:`doc_bigrams`."""
    toks = _ws_tokens(text_col)
    triples = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
                F.element_at(toks, i + 2).alias("w3"),
            ),
        ),
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__tg_id"), F.explode_outer(triples).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(
            F.col("__tg_id").alias(id_col),
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
            F.col("p.w3").alias("w3"),
        )
    )


def trigram_interpolated_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
) -> DataFrame:
    """Per-document mean surprisal in bits under a JELINEK-MERCER
    interpolated trigram model fit on the corpus itself — the next
    Markov order up from :func:`bigram_surprisal` and the closest
    zero-dependency analog of the KenLM perplexity filters CCNet-class
    pipelines deploy:

    ``p(w3 | w1 w2) = l3 * C(w1w2w3)/C(w1w2·)
                    + l2 * C(w2w3)/C(w2·)
                    + l1 * C(w3)/N``

    with ``lambdas = (l3, l2, l1)`` summing to 1. Interpolation (not
    backoff) keeps the probability a pure arithmetic combination of
    five count frames — every term SQL-replayable, no order-dependent
    float accumulation beyond the per-doc mean. Self-scored, every
    count is >= 1, so no smoothing floor is needed; the unigram leg
    still damps rare-context spikes exactly the way the filter is
    used in practice.

    Returns ``(id_col, n_trigrams, avg_surprisal)``; docs with < 3
    tokens are absent.

    Scale: the LM is ONE aggregate over the exploded trigram stream —
    trigram counts shuffled on (w1,w2,w3) — with the context totals
    C(w1,w2), the bigram leg C(w2,w3), its context C(w2) and the
    unigram leg C(w3), N ALL derived from the persisted counts frame
    (|trigram types| rows, never a second corpus pass; C(w2,·) sums
    counts grouped on the MIDDLE token, which equals the token's
    left-context total over the trigram stream). The doc stream then
    joins the legs on their token keys; a web-scale count table is
    deliberately never broadcast — only the 1-row N is."""
    return score_trigram_lm(
        df,
        fit_trigram_lm(df, text_col, id_col=id_col),
        text_col,
        id_col,
        lambdas=lambdas,
    )


def fit_trigram_lm(
    df: DataFrame, text_col: str = "text", *, id_col: str = "doc_id"
) -> dict[str, DataFrame]:
    """Fit the five count frames of the Jelinek-Mercer trigram model
    on a (batch) reference corpus: ``{counts, ctx12, big23, ctx2,
    uni3, total}`` — the STANDING model :func:`score_trigram_lm` scores any
    frame (batch or stream) against. The trigram counts frame is
    persisted; all legs derive from it (|trigram types| rows, never a
    second corpus pass; see
    :func:`trigram_interpolated_surprisal`)."""
    from polars_text_spark.persist import track_persist

    tg = doc_trigrams(df, text_col, id_col)
    counts = track_persist(
        tg.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("__c3"))
        .persist()
    )
    return {
        "counts": counts,
        "ctx12": counts.groupBy("w1", "w2").agg(
            F.sum("__c3").alias("__c12")
        ),
        "big23": counts.groupBy("w2", "w3").agg(
            F.sum("__c3").alias("__c23")
        ),
        "ctx2": counts.groupBy("w2").agg(F.sum("__c3").alias("__c2")),
        "uni3": counts.groupBy("w3").agg(F.sum("__c3").alias("__c3u")),
        "total": counts.agg(F.sum("__c3").cast("double").alias("__n")),
    }


def score_trigram_lm(
    df: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    oov: str = "drop",
) -> DataFrame:
    """Score ``df`` against a STANDING trigram model from
    :func:`fit_trigram_lm`.

    ``df`` may be a STREAMING frame: every model join is then a
    stream-static equi-join (the web-scale count tables are
    deliberately never broadcast — only the 1-row N is) and the
    per-doc aggregate runs under the stream's output mode; parity with
    the batch path is pinned by tests/test_streaming_quality_ops.py.

    ``oov`` controls what happens to trigrams ABSENT from the model
    (possible only when scoring a different corpus than the fit one;
    self-scoring via :func:`trigram_interpolated_surprisal` has every
    count >= 1, so the modes coincide there):

    - ``"drop"`` (default, the self-scoring-compatible contract):
      inner joins skip unknown trigrams — ``(id_col, n_trigrams,
      avg_surprisal)``. CROSS-CORPUS CAVEAT (ADVICE r12): OOV-heavy
      junk docs then have their unknown mass silently excluded from
      the average (understating their surprisal — biased exactly
      against the docs a quality filter targets) and a doc with ZERO
      known trigrams vanishes from the output entirely. Use
      ``"backoff"`` when the scored corpus differs from the fit one.
    - ``"backoff"``: LEFT joins with a smoothing floor — an unknown
      trigram/bigram leg contributes 0 and an unseen word backs off
      to ``l1 * 1/N`` (the Laplace-style floor on the unigram leg),
      so every trigram scores and every doc with >= 3 tokens appears.
      Output adds the dropped-mass accounting: ``(id_col, n_trigrams,
      n_unknown, coverage, avg_surprisal)`` where ``n_unknown``
      counts trigram tokens absent from the model and ``coverage`` is
      the known fraction. Requires ``l1 > 0`` (otherwise a fully
      unknown trigram has probability 0 and infinite surprisal).
    """
    l3, l2, l1 = (float(x) for x in lambdas)
    if abs(l3 + l2 + l1 - 1.0) > 1e-9 or min(l3, l2, l1) < 0:
        raise ValueError(
            f"lambdas must be non-negative and sum to 1, got {lambdas}"
        )
    if oov not in ("drop", "backoff"):
        raise ValueError(f"oov must be 'drop' or 'backoff', got {oov!r}")
    tg = doc_trigrams(df, text_col, id_col)
    if oov == "drop":
        prob = (
            F.lit(l3) * (F.col("__c3") / F.col("__c12"))
            + F.lit(l2) * (F.col("__c23") / F.col("__c2"))
            + F.lit(l1) * (F.col("__c3u") / F.col("__n"))
        )
        return (
            tg.join(model["counts"], ["w1", "w2", "w3"])
            .join(model["ctx12"], ["w1", "w2"])
            .join(model["big23"], ["w2", "w3"])
            .join(model["ctx2"], "w2")
            .join(model["uni3"], "w3")
            .crossJoin(F.broadcast(model["total"]))
            .select(id_col, (-F.log2(prob)).alias("__bits"))
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_trigrams"),
                F.avg("__bits").alias("avg_surprisal"),
            )
        )
    if l1 <= 0:
        raise ValueError(
            "oov='backoff' requires lambdas[2] > 0: the unigram floor "
            "l1/N is the only mass a fully-unknown trigram gets"
        )
    # left joins: a missing leg's ratio coalesces to 0 (leg unseen in
    # the fit corpus), and the unigram count floors at 1 so unseen
    # words score l1/N instead of dropping the row
    prob = (
        F.lit(l3)
        * F.coalesce(F.col("__c3") / F.col("__c12"), F.lit(0.0))
        + F.lit(l2)
        * F.coalesce(F.col("__c23") / F.col("__c2"), F.lit(0.0))
        + F.lit(l1) * (F.coalesce(F.col("__c3u"), F.lit(1)) / F.col("__n"))
    )
    return (
        tg.join(model["counts"], ["w1", "w2", "w3"], "left")
        .join(model["ctx12"], ["w1", "w2"], "left")
        .join(model["big23"], ["w2", "w3"], "left")
        .join(model["ctx2"], "w2", "left")
        .join(model["uni3"], "w3", "left")
        .crossJoin(F.broadcast(model["total"]))
        .select(
            id_col,
            (-F.log2(prob)).alias("__bits"),
            F.col("__c3").isNull().cast("long").alias("__unk"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("__unk").alias("n_unknown"),
            (
                1.0 - F.sum("__unk") / F.count(F.lit(1))
            ).alias("coverage"),
            F.avg("__bits").alias("avg_surprisal"),
        )
    )


def _two_phase_topk(
    frame: DataFrame,
    order: list,
    k: int,
    *,
    key_col: str,
    rank_name: str = "rank",
    buckets: int = 32,
) -> DataFrame:
    """Global top-``k`` without a corpus-vocab-sized single-task sort.

    Phase 1 ranks inside ``buckets`` hash buckets of ``key_col`` — a
    PARTITIONED window, so the heavy sort parallelizes — and keeps each
    bucket's local top-``k``. Phase 2 ranks the <= ``buckets * k``
    survivors globally; that final unpartitioned window is bounded by
    construction (k * buckets rows), independent of vocabulary size.
    Semantics are exactly the single-window ``row_number() <= k``:
    every global-top-k row is, under the same total ordering, within
    its own bucket's top-k (a bucket is a subset of the frame), so no
    survivor is lost."""
    w_local = Window.partitionBy("__tpk_b").orderBy(*order)
    w_global = Window.orderBy(*order)
    return (
        frame.withColumn(
            "__tpk_b", F.pmod(F.xxhash64(key_col), F.lit(int(buckets)))
        )
        .withColumn("__tpk_lr", F.row_number().over(w_local))
        .filter(F.col("__tpk_lr") <= k)
        .drop("__tpk_b", "__tpk_lr")
        .withColumn(rank_name, F.row_number().over(w_global))
        .filter(F.col(rank_name) <= k)
    )


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 10000) -> DataFrame:
    """Top-``k`` whitespace tokens by corpus count (count desc, token
    asc tie-break — the deterministic ordering a tokenizer-vocab build
    needs). Returns ``(token, cnt, rank)``.

    Scale: ranking is the two-phase top-k (:func:`_two_phase_topk`) —
    a web-scale vocab is 10^7–10^8 rows, and a single unpartitioned
    ``row_number()`` window over it is a one-task sort stall. Phase 1
    ranks inside 32 hash buckets in parallel; only the bounded
    ``32 * k`` survivors reach the global merge window. The corpus
    itself is touched once by the explode+groupBy in
    :func:`unigram_frequencies`."""
    return _two_phase_topk(
        unigram_frequencies(df, text_col),
        [F.col("cnt").desc(), F.col("token").asc()],
        k,
        key_col="token",
    )


def oov_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 10000,
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a top-``k`` corpus
    vocabulary (or an explicit ``vocab_df`` with a ``token`` column —
    e.g. a real tokenizer's vocab read from parquet). The canonical
    "will my tokenizer shred this document into bytes?" signal.

    Returns ``(id_col, n_tokens, n_oov, oov_rate)``; token-less docs
    are absent. The vocab side is broadcast: k rows by construction,
    never corpus-sized."""
    vocab = (vocab_df or vocab_topk(df, text_col, k)).select("token")
    toks = df.filter(F.col(text_col).isNotNull()).select(
        id_col, F.explode(_ws_tokens(text_col)).alias("token")
    )
    joined = toks.join(
        F.broadcast(vocab.withColumn("__in_vocab", F.lit(1))), "token", "left"
    )
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
        F.avg(F.when(F.col("__in_vocab").isNull(), 1.0).otherwise(0.0)).alias(
            "oov_rate"
        ),
    )


def source_kl_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group KL divergence (bits) between the group's unigram
    distribution P_g and the whole-corpus distribution Q:
    ``KL(P_g || Q) = Σ_t P_g(t) · log2(P_g(t) / Q(t))`` — the
    data-mixture diagnostic that flags a source whose token
    distribution has drifted from the corpus (spam injection, wrong
    language, template flood). Every group token is in the corpus by
    construction, so no smoothing is needed and the sum is finite.

    Returns ``(group_col, n_tokens, kl_bits)``.

    Scale: one explode + one groupBy(group, token) shuffle over the
    corpus; the per-group and per-token totals are PARTITIONED window
    sums over the aggregated |groups|×|vocab| frame. The corpus total
    is NOT a ``Window.partitionBy()`` sum — that would funnel the
    whole aggregated frame (tens of millions of rows on a web vocab)
    through ONE window task; it is the repo's broadcast-total pattern
    (a 1-row aggregate cross-joined in, 8 bytes over the wire). The
    aggregated frame is persisted so the total's aggregate re-reads
    it instead of re-scanning the corpus."""
    from polars_text_spark.persist import track_persist

    gt = track_persist(
        df.filter(F.col(text_col).isNotNull())
        .select(group_col, F.explode(_ws_tokens(text_col)).alias("token"))
        .groupBy(group_col, "token")
        .agg(F.count("*").alias("cnt_gt"))
        .persist()
    )
    total = gt.agg(F.sum("cnt_gt").alias("total"))
    w_g = Window.partitionBy(group_col)
    w_t = Window.partitionBy("token")
    scored = gt.select(
        group_col,
        F.col("cnt_gt"),
        F.sum("cnt_gt").over(w_g).alias("total_g"),
        F.sum("cnt_gt").over(w_t).alias("cnt_t"),
    ).crossJoin(F.broadcast(total)).select(
        group_col,
        "cnt_gt",
        "total_g",
        (
            (F.col("cnt_gt") / F.col("total_g"))
            * F.log2(
                (F.col("cnt_gt") / F.col("total_g"))
                / (F.col("cnt_t") / F.col("total"))
            )
        ).alias("__term"),
    )
    return scored.groupBy(group_col).agg(
        F.sum("cnt_gt").alias("n_tokens"),
        F.sum("__term").alias("kl_bits"),
    )


def zipf_slope_by(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = None,
    *,
    top_n: int = 10000,
) -> DataFrame:
    """Zipf fit per group: OLS slope/intercept of ``log2(cnt)`` on
    ``log2(rank)`` over the group's ``top_n`` tokens (rank by cnt
    desc, token asc). Natural text sits near slope −1; token soup and
    template floods flatten or cliff the curve, so the slope is a
    cheap corpus-health scalar.

    Returns ``(group_col?, n_types, zipf_slope, zipf_intercept)``.
    Built-in ``regr_slope``/``regr_intercept`` aggregates — no UDF;
    the window ranks the |groups|×|vocab| frequency frame, not the
    corpus."""
    keys = [group_col] if group_col else []
    freq = (
        df.filter(F.col(text_col).isNotNull())
        .select(*keys, F.explode(_ws_tokens(text_col)).alias("token"))
        .groupBy(*keys, "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    ranked = freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    lx = F.log2(F.col("rank").cast("double"))
    ly = F.log2(F.col("cnt").cast("double"))
    return ranked.groupBy(*keys).agg(
        F.count("*").alias("n_types"),
        F.regr_slope(ly, lx).alias("zipf_slope"),
        F.regr_intercept(ly, lx).alias("zipf_intercept"),
    )


def cardinality_report(
    df: DataFrame,
    group_col: str,
    key_col,
    *,
    rsd: float = 0.02,
    rel_err_bound: float = 0.1,
) -> DataFrame:
    """Per-group distinct-cardinality report with a sketch-accuracy
    audit: ``(group_col, n_rows, n_distinct, sketch_ok)``.

    ``n_distinct`` is the exact count; ``sketch_ok`` asserts the
    HyperLogLog++ estimate (``approx_count_distinct`` at ``rsd``)
    lands within ``rel_err_bound`` of it. At 100 TB the exact count is
    the thing you STOP computing — dedup-rate dashboards run on the
    sketch (one pass, mergeable partial state, no exact-distinct
    shuffle of the key universe) — and this report is the per-shard
    calibration you run where exact is still affordable, so the
    sketch path ships with a measured error bound instead of a quoted
    one. ``key_col`` may be any column or expression (typically a
    content fingerprint).
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct(key).cast("long").alias("n_distinct"),
        (
            F.abs(
                F.approx_count_distinct(key, rsd).cast("double")
                - F.countDistinct(key).cast("double")
            )
            <= F.lit(rel_err_bound) * F.countDistinct(key).cast("double")
        ).alias("sketch_ok"),
    )


def heavy_hitters_audit(
    df: DataFrame,
    text_col: str = "text",
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Top-``k`` corpus tokens with a count-min-sketch accuracy audit:
    ``(token, exact_count, cms_est, rank)``.

    The companion to :func:`cardinality_report` for FREQUENCY sketches:
    at 100 TB the exact token-count table is the thing a trending /
    heavy-hitters dashboard stops computing — it runs on a count-min
    sketch (``depth x width`` counters, mergeable partial state, fixed
    memory). This report re-derives the sketch estimate for the exact
    top-k where exact is still affordable, shipping the sketch path
    with a MEASURED per-token error instead of the quoted
    ``eps*N``-with-probability-``1-delta`` bound.

    Design points:

    - The sketch is built from the ALREADY-AGGREGATED ``(token, count)``
      frame, not the raw token stream — identical counters (CMS cells
      are sums, and sums of per-token subtotals equal sums over
      occurrences), but the depth-fold explodes a vocabulary-sized
      frame instead of the corpus token stream.
    - Row hashes are the engine-portable sha256-prefix
      (``conv(substr(sha2('j:'||token), 1, 15), 16, 10) % width``), so
      a SQL oracle re-derives EVERY counter and estimate — a
      value-verified sketch, like the KMV Jaccard estimator.
    - The ``depth x width`` counter table and the k-row top-k are both
      broadcast; the only corpus-scale shuffle is the token count
      groupBy (with map-side combine), shared with the exact path via
      exchange reuse.

    Guarantee audited: ``cms_est >= exact_count`` always (CMS never
    underestimates); the gap is the collision mass.
    """
    if k < 1 or depth < 1 or width < 1:
        raise ValueError("k, depth and width must all be >= 1")
    counts = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(_ws_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )

    def bucket(j: int) -> "F.Column":
        h = F.conv(
            F.substring(F.sha2(F.concat(F.lit(f"{j}:"), F.col("token")), 256), 1, 15),
            16,
            10,
        ).cast("long")
        return (h % width).cast("long")

    rows = counts.select(
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), bucket(j).alias("b"))
                    for j in range(depth)
                ]
            )
        ).alias("jb"),
    )
    cms = rows.groupBy(F.col("jb.j").alias("j"), F.col("jb.b").alias("b")).agg(
        F.sum("exact_count").alias("bucket_sum")
    )

    # two-phase top-k: the exact-count ranking parallelizes over hash
    # buckets; only <= 32*k survivors hit the global merge window
    # (the vocab frame itself can be 10^7+ rows at web scale).
    topk = _two_phase_topk(
        counts,
        [F.col("exact_count").desc(), F.col("token")],
        k,
        key_col="token",
    )
    probes = topk.select(
        "token",
        "exact_count",
        "rank",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), bucket(j).alias("b"))
                    for j in range(depth)
                ]
            )
        ).alias("jb"),
    )
    est = (
        probes.join(
            F.broadcast(cms),
            (F.col("jb.j") == F.col("j")) & (F.col("jb.b") == F.col("b")),
        )
        .groupBy("token", "exact_count", "rank")
        .agg(F.min("bucket_sum").alias("cms_est"))
    )
    return est.select("token", "exact_count", "cms_est", "rank")


def doc_ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: what fraction of a doc's DISTINCT
    ``n``-grams appear in no other document — the inverse of the
    Lee-et-al duplicated-span signal, and the standard memorization /
    contamination audit for a training corpus (novelty near 0 means
    the doc is assembled from corpus-common n-grams).

    Returns ``(id_col, n_grams, n_novel, novelty)`` with ``novelty =
    round(n_novel / n_grams, 6)``; docs with fewer than ``n`` tokens
    are absent. ``id_col`` must be unique.

    Scale: gram construction is map-only (slice over the token array);
    the per-doc DISTINCT and the corpus document-frequency are two hash
    aggregations over (gram, id) / (gram); attaching df back is one
    equi-join on the gram key — the same Zipf-skew-tolerant 1:N shape
    as unigram_surprisal (AQE handles hot grams).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from polars_text_spark.functions.analysis import word_ngram_array

    grams = word_ngram_array(_ws_tokens(text_col), n)
    doc_grams = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .select(id_col, "gram")
    )
    gram_df = doc_grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("__df")
    )
    joined = doc_grams.join(gram_df, "gram")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("__df") == 1).cast("long")).alias("n_novel"),
        )
        .select(
            id_col,
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


def length_outlier_report(
    df: DataFrame,
    group_col: str,
    length_col,
    *,
    iqr_factor: float = 1.5,
) -> DataFrame:
    """Per-group Tukey-fence length audit: ``(group_col, n_docs, q1,
    q3, low_fence, high_fence, n_low, n_high)``.

    The length screen every curation pipeline runs per domain —
    truncated fragments below the low fence, concatenation blobs above
    the high one. Quartiles are exact ``percentile`` (≙
    ``percentile_approx`` at 100 TB — the exact/sketch calibration
    stance of ``length_quantiles``); fences are ``q1/q3 ∓
    iqr_factor*(q3-q1)``.

    Scale: one groupBy for the quartiles, the fence table (|groups|
    rows) broadcast back for the flag counts — the corpus shuffles once
    on the group key, in map-side-combinable form.
    """
    length = F.col(length_col) if isinstance(length_col, str) else length_col
    base = df.select(F.col(group_col).alias("g"), length.cast("double").alias("len"))
    fences = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile("len", F.lit(0.25)).alias("q1"),
        F.percentile("len", F.lit(0.75)).alias("q3"),
    )
    fences = fences.select(
        "g",
        "n_docs",
        "q1",
        "q3",
        (F.col("q1") - iqr_factor * (F.col("q3") - F.col("q1"))).alias("low_fence"),
        (F.col("q3") + iqr_factor * (F.col("q3") - F.col("q1"))).alias("high_fence"),
    )
    flags = (
        base.join(F.broadcast(fences), "g")
        .groupBy("g", "n_docs", "q1", "q3", "low_fence", "high_fence")
        .agg(
            F.sum((F.col("len") < F.col("low_fence")).cast("long")).alias("n_low"),
            F.sum((F.col("len") > F.col("high_fence")).cast("long")).alias("n_high"),
        )
    )
    return flags.select(
        F.col("g").alias(group_col),
        "n_docs",
        F.round("q1", 6).alias("q1"),
        F.round("q3", 6).alias("q3"),
        F.round("low_fence", 6).alias("low_fence"),
        F.round("high_fence", 6).alias("high_fence"),
        "n_low",
        "n_high",
    )


def heaps_law_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bucket_size: int = 1024,
) -> DataFrame:
    """Heaps' law fit: OLS of ``log2(cum_types)`` on ``log2(cum_tokens)``
    over the corpus consumed in ``id_col`` order — vocabulary growth
    ``V(n) ≈ k·n^beta`` (natural text: beta ~0.4-0.6; a flat curve
    flags template floods, a near-1 slope flags token soup). The
    growth-curve companion to :func:`zipf_slope_by`.

    Returns one row ``(n_docs, beta, log2_k)`` (fit coefficients
    rounded to 6 dp).

    Scale: "cumulative distinct types" never scans the corpus twice —
    a token's type contribution lands on its FIRST document
    (``groupBy(token).agg(min(id))``), so the cumulative frame is
    doc-level. The running sums use a TWO-PHASE bucketed cumsum
    (within-bucket window partitioned by ``id div bucket_size`` +
    per-bucket offsets from the tiny bucket frame) — no global
    single-partition window over the doc frame.
    """
    if bucket_size < 1:
        raise ValueError(f"bucket_size must be >= 1, got {bucket_size}")
    # Bucketing divides the id: a non-numeric id would cast to null,
    # collapse every row into one null bucket, and silently serialize
    # the cumsum — the exact shape this design avoids. Fail at plan
    # time instead (hash string ids to a long first if needed).
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, T.NumericType):
        raise TypeError(
            f"heaps_law_fit requires a numeric {id_col!r} for bucketed "
            f"cumulative sums; got {id_type.simpleString()} — derive a "
            "numeric order key first (e.g. xxhash64 or a row_number)"
        )
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.explode(_ws_tokens(text_col)).alias("token")
    )
    per_doc = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))
    new_types = (
        toks.groupBy("token")
        .agg(F.min("id").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    doc = per_doc.join(new_types, "id", "left").select(
        "id",
        "n_tok",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        F.floor(F.col("id") / bucket_size).alias("__b"),
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    doc = doc.select(
        "id",
        "__b",
        F.sum("n_tok").over(w_in).alias("__ct_in"),
        F.sum("n_new").over(w_in).alias("__cy_in"),
    )
    btot = doc.groupBy("__b").agg(
        F.max("__ct_in").alias("__bt"), F.max("__cy_in").alias("__by")
    )
    w_b = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = btot.select(
        "__b",
        (F.sum("__bt").over(w_b) - F.col("__bt")).alias("__ot"),
        (F.sum("__by").over(w_b) - F.col("__by")).alias("__oy"),
    )
    cum = doc.join(F.broadcast(offsets), "__b").select(
        "id",
        (F.col("__ct_in") + F.col("__ot")).alias("cum_tokens"),
        (F.col("__cy_in") + F.col("__oy")).alias("cum_types"),
    )
    pts = cum.where((F.col("cum_tokens") > 0) & (F.col("cum_types") > 0))
    return pts.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.regr_slope(F.log2("cum_types"), F.log2("cum_tokens")), 6
        ).alias("beta"),
        F.round(
            F.regr_intercept(F.log2("cum_types"), F.log2("cum_tokens")), 6
        ).alias("log2_k"),
    )


def quantile_sketch_audit(
    df: DataFrame,
    group_col: str,
    value_col,
    *,
    accuracy: int = 1000,
) -> DataFrame:
    """Per-group quantile report with a Greenwald-Khanna sketch audit:
    ``(group_col, n_rows, p50_exact, p90_exact, gk_p50_ok, gk_p90_ok)``.

    The third panel of the sketch-calibration family
    (:func:`cardinality_report` = HLL, :func:`heavy_hitters_audit` =
    CMS): at 100 TB percentile dashboards run on
    ``percentile_approx`` (mergeable GK summaries, bounded memory);
    this report checks, where exact is still affordable, that each
    approximate value's RANK lands inside the published
    ``p ± 1/accuracy`` window — a measured guarantee, not a quoted one.

    The ok-booleans are pinned TRUE by the GK contract, which is what
    a SQL oracle asserts (the sketch internals aren't portable; its
    guarantee is).

    A NULL group key forms its own group (the rank-check join is
    null-safe), matching a plain SQL ``GROUP BY``, which emits a
    NULL-group row — an equi-join here would silently drop it.
    """
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    eps = 1.0 / accuracy
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(F.col(group_col).alias("g"), val.cast("double").alias("v"))
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile("v", F.lit(0.5)).alias("p50_exact"),
        F.percentile("v", F.lit(0.9)).alias("p90_exact"),
        F.percentile_approx("v", F.array(F.lit(0.5), F.lit(0.9)), F.lit(accuracy)).alias(
            "__ap"
        ),
    )
    lhs = base.withColumnRenamed("g", "__gl")
    checked = (
        lhs.join(F.broadcast(agg), F.col("__gl").eqNullSafe(F.col("g")))
        .drop("__gl")
        .groupBy("g", "n_rows", "p50_exact", "p90_exact")
        .agg(
            F.sum((F.col("v") <= F.element_at("__ap", 1)).cast("long")).alias("__le50"),
            F.sum((F.col("v") < F.element_at("__ap", 1)).cast("long")).alias("__lt50"),
            F.sum((F.col("v") <= F.element_at("__ap", 2)).cast("long")).alias("__le90"),
            F.sum((F.col("v") < F.element_at("__ap", 2)).cast("long")).alias("__lt90"),
        )
    )
    n = F.col("n_rows").cast("double")

    def ok(le, lt, p):
        lo = F.floor(F.lit(p - eps) * n)
        hi = F.ceil(F.lit(p + eps) * n)
        return (F.col(le) >= lo) & (F.col(lt) <= hi)

    return checked.select(
        F.col("g").alias(group_col),
        "n_rows",
        F.round("p50_exact", 6).alias("p50_exact"),
        F.round("p90_exact", 6).alias("p90_exact"),
        ok("__le50", "__lt50", 0.5).alias("gk_p50_ok"),
        ok("__le90", "__lt90", 0.9).alias("gk_p90_ok"),
    )


def language_consistency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sep: str = "\n",
) -> DataFrame:
    """Mixed-language detection: split each document into segments on
    ``sep``, language-ID every segment with the heuristic detector
    (:func:`polars_text_spark.functions.analysis.detect_language`),
    and report per document ``(n_segments, n_langs, dominant_lang,
    consistency)`` — ``consistency`` is the dominant language's share
    of segments. The standard multilingual-curation gate: a "German"
    page that is half English boilerplate scores 0.5, and a
    web-template flood shows up as a consistency cliff per source.

    Dominant tie-break: most segments, then alphabetical language —
    deterministic, SQL-replayable. Blank segments are dropped;
    segment-less docs are absent. ``sep`` is a LITERAL separator
    (regex metacharacters are quoted before the split, so
    ``sep='|'`` splits on pipes, not between every character).

    Scale: one explode + one (doc, lang) hash aggregation (map-side
    combined), then a window PARTITIONED by the doc id over the
    per-language counts (a handful of rows per doc — never a global
    window)."""
    from polars_text_spark.functions.analysis import detect_language

    segs = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__lc_id"),
            # \Q..\E quotes the whole separator for Java's regex
            # engine (F.split's pattern language) — the documented
            # literal-separator contract; a sep containing \E itself
            # is escaped piecewise
            F.explode(
                F.split(F.col(text_col), _java_regex_quote(sep))
            ).alias("seg"),
        )
        .filter(F.trim(F.col("seg")) != "")
    )
    counts = (
        segs.select("__lc_id", detect_language("seg"))
        .groupBy("__lc_id", "lang_detected")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy("__lc_id").orderBy(
        F.col("__n").desc(), F.col("lang_detected").asc()
    )
    w_doc = Window.partitionBy("__lc_id")
    return (
        counts.select(
            "__lc_id",
            "lang_detected",
            "__n",
            F.row_number().over(w).alias("__r"),
            F.sum("__n").over(w_doc).alias("n_segments"),
            F.count(F.lit(1)).over(w_doc).alias("n_langs"),
        )
        .filter(F.col("__r") == 1)
        .select(
            F.col("__lc_id").alias(id_col),
            "n_segments",
            F.col("n_langs").cast("int").alias("n_langs"),
            F.col("lang_detected").alias("dominant_lang"),
            (F.col("__n").cast("double") / F.col("n_segments")).alias(
                "consistency"
            ),
        )
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    by: str | None = None,
    *,
    n_buckets: int = 3,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Discrete-quantile bucket labels 0..``n_buckets``-1 per row —
    the CCNet head/middle/tail split (perplexity terciles per
    language) generalized: bucket ``b`` holds the rows whose value is
    at or below the group's ``(b+1)/n``-th discrete quantile.

    Exactness contract: thresholds are ACTUAL data values chosen by
    integer arithmetic (smallest value whose cumulative count
    satisfies ``cum * n_buckets >= k * total``) — no interpolation,
    no float quantile math, so a SQL oracle reproduces every label
    bit-for-bit. Ties share a value and therefore a bucket; buckets
    are only approximately equal-sized under heavy ties (the discrete
    quantile definition, same as DuckDB's ``quantile_disc``).

    Scale shape: one hash aggregation builds the per-group VALUE
    HISTOGRAM, so the cumulative window runs over distinct values,
    not rows — its size is set by value granularity, not corpus size
    (pre-round the value column to pick the granularity; 6 decimals
    of a bounded score keeps it ~1e5 rows). The threshold table is
    |groups| rows, broadcast back; assignment is map-only. Rows with
    a null value (or a group absent from the thresholds) get a null
    bucket, never a silent top-bucket.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    keys = [by] if by else []
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    cum = hist.select(
        *keys, value_col, F.sum("__n").over(w).alias("__cum")
    )
    if keys:
        totals = (
            df.filter(F.col(value_col).isNotNull())
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__tot"))
        )
        joined = cum.join(totals, keys)
    else:
        totals = df.filter(F.col(value_col).isNotNull()).agg(
            F.count(F.lit(1)).alias("__tot")
        )
        joined = cum.crossJoin(F.broadcast(totals))
    th = joined.groupBy(*keys).agg(
        *[
            F.min(
                F.when(
                    F.col("__cum") * n_buckets >= k * F.col("__tot"),
                    F.col(value_col),
                )
            ).alias(f"__t{k}")
            for k in range(1, n_buckets)
        ]
    )
    out = (
        df.join(F.broadcast(th), keys, "left")
        if keys
        else df.crossJoin(F.broadcast(th))
    )
    bucket = None
    for k in range(1, n_buckets):
        cond = F.col(value_col) <= F.col(f"__t{k}")
        bucket = (
            F.when(cond, k - 1) if bucket is None else bucket.when(cond, k - 1)
        )
    bucket = bucket.otherwise(n_buckets - 1)
    bucket = F.when(
        F.col(value_col).isNull() | F.col("__t1").isNull(), F.lit(None)
    ).otherwise(bucket)
    return out.withColumn(bucket_col, bucket.cast("int")).drop(
        *[f"__t{k}" for k in range(1, n_buckets)]
    )
