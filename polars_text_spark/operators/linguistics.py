"""Corpus-linguistics analysis operators: n-grams, collocations, dispersion.

The reference platform's analysis surface (concordance, token
frequencies, keyness stats — /root/reference/src/concordance.rs,
src/token_frequencies.rs) is the KWIC/AntConc family; these three
operators round out that family with the other classic corpus-linguistics
tools a user of such a platform expects:

- :func:`ngram_counts` — corpus n-gram frequency table (AntConc
  "N-Grams" tool);
- :func:`collocations` — windowed co-occurrence pairs scored with PMI
  (Church & Hanks 1990) and logDice (Rychlý 2008), the two standard
  collocation-strength measures;
- :func:`dispersion` — Gries' DP / DP_norm (Gries 2008, "Dispersions
  and adjusted frequencies in corpus linguistics"), measuring how evenly
  a token spreads across corpus parts.

All three use the engine-portable whitespace tokenizer (lowercase +
``\\s+`` split) so a SQL oracle can re-derive every value — the reference
platform's own frequency tools are exercised through the full tokenizer
via ``token_frequencies``; these are corpus-level statistics where the
tokenization contract is part of the operator definition.

Scale design (100 TB):

- n-gram and collocation pair generation is MAP-ONLY — grams/pairs are
  built per-row with ``slice``/``arrays_zip`` array built-ins (no
  self-join on position, which would shuffle the token stream twice);
  the only shuffle is the final ``groupBy`` with map-side partial
  aggregation.
- dispersion never densifies the (token × part) matrix: the absent-part
  mass is recovered in closed form from the present rows
  (``1 - sum(present part shares)``), so the shuffled frame stays
  proportional to the number of DISTINCT (token, part) pairs actually
  observed.
- Scores are rounded (``ROUND_DP``) so libm ``ln`` ulp differences can
  never flip a downstream comparison between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ngram_counts",
    "collocations",
    "dispersion",
    "term_dispersion_bins",
    "prefix_boilerplate",
    "vocab_spelling_pairs",
    "node_collocates",
    "ROUND_DP",
]

# Score rounding for cross-engine (libm ulp) stability; matches the
# contract used by tfidf_keywords / quality scores elsewhere in the repo.
ROUND_DP = 6


def _ws_token_array(text_col: str) -> Column:
    """Lowercased whitespace tokens, empties removed — the shared
    portable contract (functions/analysis.py::ws_token_array)."""
    from polars_text_spark.functions.analysis import ws_token_array

    return ws_token_array(text_col)


def _windowed_pairs(docs: DataFrame, window: int) -> DataFrame:
    """Directed within-window token pairs ``(a, b)`` of a one-column
    frame ``docs(__toks array<string>)`` — the map-only slice/arrays_zip
    construction shared by :func:`collocations` and
    :func:`node_collocates` (one definition, one contract)."""
    tarr = F.col("__toks")
    pair_arrays = [
        F.when(
            F.size(tarr) > d,
            F.arrays_zip(
                F.slice(tarr, 1, F.size(tarr) - d).alias("a"),
                F.slice(tarr, 1 + d, F.size(tarr) - d).alias("b"),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        for d in range(1, window + 1)
    ]
    return docs.select(F.explode(F.concat(*pair_arrays)).alias("p")).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    n: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide ``n``-gram frequency table.

    Returns ``DataFrame[ngram: string, count: long]`` where ``ngram`` is
    the space-joined token window. Documents with fewer than ``n``
    tokens contribute nothing. Gram construction is map-only
    (``slice`` over the token array per starting offset); the single
    shuffle is the count ``groupBy`` with map-side combine.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from polars_text_spark.functions.analysis import word_ngram_array

    toks = _ws_token_array(text_col)
    grams = word_ngram_array(toks, n)
    out = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        out = out.where(F.col("count") >= min_count)
    return out


def collocations(
    df: DataFrame,
    text_col: str = "text",
    *,
    window: int = 3,
    min_pair_count: int = 2,
    broadcast_unigrams: bool = True,
) -> DataFrame:
    """Windowed collocation pairs scored with PMI and logDice.

    A pair ``(a, b)`` is counted once for every occurrence where ``b``
    follows ``a`` within ``window`` tokens (directed, distances
    ``1..window`` — the deterministic contract; symmetric measures can
    be had by summing the two directions downstream).

    Returns ``(a, b, pair_count, count_a, count_b, pmi, log_dice)``:

    - ``pmi = round(log2((pair_count / M) / ((count_a / N) *
      (count_b / N))), 6)`` with ``N`` total tokens and ``M`` total
      pair slots;
    - ``log_dice = round(14 + log2(2 * pair_count /
      (count_a + count_b)), 6)`` (Rychlý 2008).

    Scale: pair generation is map-only — for each distance ``d`` the
    pair stream is ``arrays_zip(slice(toks, 1, L-d), slice(toks, 1+d,
    L-d))``, concatenated across distances and exploded once, so the
    per-doc cost is ``window × tokens`` with NO positional self-join.
    Shuffles: one for the pair ``groupBy``, one for the unigram
    ``groupBy``; the unigram table (vocabulary-sized, orders of
    magnitude smaller than the corpus) is broadcast for the two marginal
    joins when ``broadcast_unigrams`` (set False if the vocabulary
    itself is huge — AQE then picks the join side).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = _ws_token_array(text_col)
    docs = df.where(F.col(text_col).isNotNull()).select(toks.alias("__toks"))

    tarr = F.col("__toks")
    pairs = _windowed_pairs(docs, window)
    all_pair_counts = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("pair_count")
    )
    pair_counts = (
        all_pair_counts.where(F.col("pair_count") >= min_pair_count)
        if min_pair_count > 1
        else all_pair_counts
    )

    unigrams = (
        docs.select(F.explode(tarr).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    uni = F.broadcast(unigrams) if broadcast_unigrams else unigrams

    # Totals: two 1-row aggregates, broadcast to every pair row. Summing
    # over the ALREADY-AGGREGATED frames (not the raw streams) lets
    # Catalyst's ReuseExchange serve both from the one shuffle each.
    totals = all_pair_counts.agg(F.sum("pair_count").alias("__m")).crossJoin(
        unigrams.agg(F.sum("count").alias("__n"))
    )

    scored = (
        pair_counts.join(
            uni.select(F.col("token").alias("a"), F.col("count").alias("count_a")),
            "a",
        )
        .join(
            uni.select(F.col("token").alias("b"), F.col("count").alias("count_b")),
            "b",
        )
        .crossJoin(F.broadcast(totals))
    )
    log2 = F.log2
    pc = F.col("pair_count").cast("double")
    ca = F.col("count_a").cast("double")
    cb = F.col("count_b").cast("double")
    n = F.col("__n").cast("double")
    m = F.col("__m").cast("double")
    return scored.select(
        "a",
        "b",
        "pair_count",
        "count_a",
        "count_b",
        F.round(log2((pc / m) / ((ca / n) * (cb / n))), ROUND_DP).alias("pmi"),
        F.round(F.lit(14.0) + log2(F.lit(2.0) * pc / (ca + cb)), ROUND_DP).alias(
            "log_dice"
        ),
    )


def dispersion(
    df: DataFrame,
    part_col: str,
    text_col: str = "text",
    *,
    min_count: int = 1,
) -> DataFrame:
    """Gries' deviation-of-proportions dispersion per token.

    For token *t* with corpus frequency *f*, per-part frequencies
    *tp_i*, and part token-shares *s_i = part_tokens_i / N*:

    ``DP = 0.5 * Σ_i |tp_i / f − s_i|`` over ALL parts (including parts
    where the token is absent), and ``DP_norm = DP / (1 − min_i s_i)``
    (Gries 2008; 0 = perfectly even, → 1 = concentrated in one part).

    Returns ``(token, freq, range_parts, dp, dp_norm)`` with ``dp`` and
    ``dp_norm`` rounded to :data:`ROUND_DP`.

    Scale: the (token × part) matrix is never densified — the absent
    parts' contribution ``Σ_{tp_i = 0} s_i`` equals ``1 − Σ_{present}
    s_i``, recovered in closed form from the sparse (token, part)
    counts, so the shuffled frame is proportional to observed distinct
    pairs only. Shuffles: one for the (token, part) ``groupBy``, one
    for the per-token rollup; part totals ride as a broadcast
    (#parts rows) and the min-share as a 1-row broadcast.
    """
    toks = _ws_token_array(text_col)
    tp = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(part_col).alias("part"), F.explode(toks).alias("token"))
        .groupBy("token", "part")
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    part_totals = tp.groupBy("part").agg(F.sum("tp").alias("part_total"))
    n_total = part_totals.agg(F.sum("part_total").alias("__n"))
    min_share = part_totals.crossJoin(F.broadcast(n_total)).agg(
        F.min(F.col("part_total").cast("double") / F.col("__n")).alias("__min_s")
    )

    enriched = (
        tp.join(F.broadcast(part_totals), "part")
        .crossJoin(F.broadcast(n_total))
        .select(
            "token",
            "tp",
            (F.col("part_total").cast("double") / F.col("__n")).alias("s_i"),
        )
    )
    per_token = enriched.groupBy("token").agg(
        F.sum("tp").alias("freq"),
        F.count(F.lit(1)).alias("range_parts"),
        F.sum("s_i").alias("__present_share"),
        # Σ_present |tp/f − s_i| needs f, not known until after the agg;
        # carry the pieces and finish below via a second pass over the
        # SAME grouped stream (collected as a list would not scale; a
        # join back is one vocabulary-sized shuffle).
    )
    # |tp/f − s_i| requires f per row of `enriched`; join the token
    # totals back (vocabulary-sized, broadcast-eligible).
    freqs = per_token.select("token", "freq")
    dp_sum = (
        enriched.join(F.broadcast(freqs), "token")
        .groupBy("token")
        .agg(
            F.sum(
                F.abs(
                    F.col("tp").cast("double") / F.col("freq").cast("double")
                    - F.col("s_i")
                )
            ).alias("__present_dev")
        )
    )
    dp_raw = F.lit(0.5) * (
        F.col("__present_dev") + (F.lit(1.0) - F.col("__present_share"))
    )
    out = (
        per_token.join(dp_sum, "token")
        .crossJoin(F.broadcast(min_share))
        .select(
            "token",
            "freq",
            "range_parts",
            F.round(dp_raw, ROUND_DP).alias("dp"),
            F.round(
                dp_raw / (F.lit(1.0) - F.col("__min_s")), ROUND_DP
            ).alias("dp_norm"),
        )
    )
    if min_count > 1:
        out = out.where(F.col("freq") >= min_count)
    return out


def term_dispersion_bins(
    df: DataFrame,
    term: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bins: int = 10,
) -> DataFrame:
    """Dispersion-plot data for one term (AntConc "Plot" tool): where in
    each document the term occurs, positions normalized into ``bins``
    equal token-share bins.

    Returns ``(id_col, bin, hits)`` for documents containing the term —
    ``bin = floor(pos * bins / n_tokens)`` with ``pos`` the 0-based
    token offset, pure integer arithmetic so any engine reproduces it
    exactly.

    Scale: posexplode + an equality filter ON the exploded stream — the
    filter reaches the generator (only matching tokens survive the
    explode output), then one groupBy on (id, bin). No joins.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not term:
        raise ValueError("term must be non-empty")
    toks = _ws_token_array(text_col)
    exploded = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.size(toks).alias("__n"), F.posexplode(toks))
        .where(F.col("col") == term)
    )
    return (
        exploded.select(
            id_col,
            F.floor(F.col("pos") * bins / F.col("__n")).cast("int").alias("bin"),
        )
        .groupBy(id_col, "bin")
        .agg(F.count(F.lit(1)).alias("hits"))
    )


def prefix_boilerplate(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    *,
    k_tokens: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """Templated-opening detection: per group (source/domain), the
    first-``k_tokens`` prefixes shared by at least ``min_docs``
    documents — the cheap screen for injected headers and scraper
    banners that near-dup pipelines miss when the tail diverges.

    Returns ``(group_col, prefix, n_docs)``. Map-only prefix
    construction (slice + concat_ws), one count shuffle.
    """
    if k_tokens < 1:
        raise ValueError(f"k_tokens must be >= 1, got {k_tokens}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    toks = _ws_token_array(text_col)
    prefix = F.concat_ws(" ", F.slice(toks, 1, k_tokens))
    return (
        df.where(F.col(text_col).isNotNull() & (F.size(toks) >= k_tokens))
        .select(F.col(group_col), prefix.alias("prefix"))
        .groupBy(group_col, "prefix")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def vocab_spelling_pairs(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
) -> DataFrame:
    """Spelling-variant pairs in the corpus vocabulary: token pairs at
    Damerau-free edit distance exactly 1 (insert/delete/substitute),
    both with corpus count >= ``min_count`` — the screen behind
    spelling normalization and OCR-noise audits.

    Returns ``(a, b, count_a, count_b)`` with ``a < b``.

    Scale design — SymSpell deletion-neighborhood blocking, NOT an
    all-pairs scan: two words are within edit distance 1 only if their
    {word} ∪ {1-deletes} sets intersect, so candidates come from one
    equi-join on the deletion-variant key (each word of length L emits
    L+1 variants; the join key space is vocabulary-sized). Candidates
    are then verified with the exact ``levenshtein`` built-in. The SQL
    oracle runs the naive quadratic pairwise scan, so the differential
    gate doubles as an equivalence proof of the blocking (no pair at
    distance 1 escapes the deletion neighborhood).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = _ws_token_array(text_col)
    vocab = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    w = F.col("w")
    variants = F.concat(
        F.array(w),
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.concat(
                F.substring(w, F.lit(1), i - 1),
                w.substr(i + 1, F.length(w)),
            ),
        ),
    )
    keyed = vocab.select("w", "cnt", F.explode(variants).alias("k"))
    cand = (
        keyed.select(F.col("w").alias("a"), F.col("cnt").alias("count_a"), "k")
        .join(
            keyed.select(F.col("w").alias("b"), F.col("cnt").alias("count_b"), "k"),
            "k",
        )
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "count_a", "count_b")
        .dropDuplicates(["a", "b"])
    )
    return cand.where(F.levenshtein("a", "b") == 1)


def node_collocates(
    df: DataFrame,
    node: str,
    text_col: str = "text",
    *,
    window: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Collocates of one NODE word (AntConc "Collocates" tool): tokens
    occurring within ``window`` positions of any occurrence of
    ``node``, scored observed-vs-expected.

    Returns ``(collocate, obs, corpus_count, mi)`` where ``obs`` is the
    collocate's occurrence count inside the node's windows (both
    directions), ``corpus_count`` its corpus frequency, and ``mi =
    round(log2((obs / T) / (corpus_count / N)), 6)`` with ``T`` total
    collocate slots around the node and ``N`` total corpus tokens —
    positive MI = attracted to the node, negative = repelled.

    Scale: the windowed stream is the same map-only slice/arrays_zip
    pair construction as :func:`collocations` filtered to the node on
    either side — no positional self-join; three small aggregates
    (collocate counts, unigram counts, two 1-row totals).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not node:
        raise ValueError("node must be non-empty")
    toks = _ws_token_array(text_col)
    docs = df.where(F.col(text_col).isNotNull()).select(toks.alias("__toks"))
    tarr = F.col("__toks")
    pairs = _windowed_pairs(docs, window)
    # single pass: each pair contributes b when a is the node and a
    # when b is (both when a == b == node) — a unionAll of two filters
    # would re-tokenize and re-explode the whole corpus twice
    stream = (
        pairs.where((F.col("a") == node) | (F.col("b") == node))
        .select(
            F.explode(
                F.array(
                    F.when(F.col("a") == node, F.col("b")),
                    F.when(F.col("b") == node, F.col("a")),
                )
            ).alias("collocate")
        )
        .where(F.col("collocate").isNotNull())
    )
    obs = stream.groupBy("collocate").agg(F.count(F.lit(1)).alias("obs"))
    unigrams = (
        docs.select(F.explode(tarr).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("corpus_count"))
    )
    totals = obs.agg(F.sum("obs").alias("__t")).crossJoin(
        unigrams.agg(F.sum("corpus_count").alias("__n"))
    )
    scored = (
        obs.join(
            unigrams.select(
                F.col("token").alias("collocate"), "corpus_count"
            ),
            "collocate",
        )
        .crossJoin(F.broadcast(totals))
    )
    o = F.col("obs").cast("double")
    cc = F.col("corpus_count").cast("double")
    t = F.col("__t").cast("double")
    n = F.col("__n").cast("double")
    out = scored.select(
        "collocate",
        "obs",
        "corpus_count",
        F.round(F.log2((o / t) / (cc / n)), ROUND_DP).alias("mi"),
    )
    if min_count > 1:
        out = out.where(F.col("obs") >= min_count)
    return out
