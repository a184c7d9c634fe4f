"""Corpus token frequencies + two-corpus comparison statistics.

The reference's eager path (/root/reference/src/token_frequencies.rs:9-40,
polars_text/token_frequencies.py) materializes a whole corpus into a
driver-side dict — its least scalable surface. The Spark redesign keeps
everything distributed:

- :func:`token_frequencies` = ``explode(tokenize(text)) -> groupBy(token)
  .count()`` — map-side partial aggregation, one shuffle on ``token``;
- :func:`token_frequency_stats` = full outer join of two frequency
  tables + pure column arithmetic; corpus totals are 1-row aggregates
  broadcast via crossJoin (no second shuffle).

The statistics replicate polars_text/token_frequencies.py:62-223
*exactly*, including the quirks: the 1e-10 floors inside logs, BIC with
dof=1, ``percent_diff`` being a raw proportion difference despite its
name (:182-185), natural-log ``log_ratio``, and the null-guards on
relative_risk/log_ratio/odds_ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.functions.tokenize import tokenize

__all__ = [
    "token_frequencies",
    "token_frequency_stats",
    "tokenizer_fertility",
]

STATS_COLUMNS = [
    "token",
    "freq_corpus_0",
    "freq_corpus_1",
    "expected_0",
    "expected_1",
    "corpus_0_total",
    "corpus_1_total",
    "log_likelihood_llv",
    "bayes_factor_bic",
    "effect_size_ell",
    "significance",
    "percent_corpus_0",
    "percent_corpus_1",
    "percent_diff",
    "relative_risk",
    "log_ratio",
    "odds_ratio",
]


def token_frequencies(
    df: DataFrame, text_col: str = "text", *, model: str
) -> DataFrame:
    """Corpus-wide token counts: ``DataFrame[token: string, count: long]``.

    Tokenization is hardcoded ``lowercase=True, remove_punct=True`` like
    the reference (src/token_frequencies.rs:23). Null/whitespace-only
    texts contribute no tokens (src/token_frequencies.rs:19-21 — they
    tokenize to nothing, so no explicit skip is needed).
    """
    if not model or not model.strip():
        raise ValueError("token_frequencies requires an explicit tokenizer model ID")
    tokens = df.select(
        F.explode(
            tokenize(text_col, model=model.strip(), lowercase=True, remove_punct=True)
        ).alias("t")
    )
    return tokens.groupBy(F.col("t.token").alias("token")).agg(
        F.count(F.lit(1)).alias("count")
    )


def _freq(df: DataFrame, alias: str) -> DataFrame:
    cols = df.columns
    if len(cols) != 2:
        raise ValueError(
            "token_frequency_stats inputs must be 2-column (token, count) "
            f"DataFrames; got {cols}"
        )
    return df.select(
        F.col(cols[0]).cast("string").alias("token"),
        F.col(cols[1]).cast("long").alias(alias),
    )


def token_frequency_stats(corpus_0: DataFrame, corpus_1: DataFrame) -> DataFrame:
    """Log-likelihood-family comparison of two token frequency tables.

    Accepts the output of :func:`token_frequencies` for each corpus and
    returns the reference's exact 17-column stats table
    (polars_text/token_frequencies.py:158-223).
    """
    f0 = _freq(corpus_0, "freq_corpus_0")
    f1 = _freq(corpus_1, "freq_corpus_1")

    # Union of token keys ≙ the reference's union-of-dict-keys (:28-37).
    joined = f0.join(f1, on="token", how="full").select(
        "token",
        F.coalesce("freq_corpus_0", F.lit(0)).alias("freq_corpus_0"),
        F.coalesce("freq_corpus_1", F.lit(0)).alias("freq_corpus_1"),
    )

    # Corpus totals: one-row aggregate, broadcast to every row. At any
    # scale this is a single reduce + a broadcast — no window shuffle.
    totals = joined.agg(
        F.sum("freq_corpus_0").alias("corpus_0_total"),
        F.sum("freq_corpus_1").alias("corpus_1_total"),
    )
    df = joined.crossJoin(F.broadcast(totals))

    fr0 = F.col("freq_corpus_0").cast("double")
    fr1 = F.col("freq_corpus_1").cast("double")
    c0 = F.col("corpus_0_total").cast("double")
    c1 = F.col("corpus_1_total").cast("double")
    grand = c0 + c1
    total_freq = fr0 + fr1

    expected_0 = (total_freq * c0 / grand).alias("expected_0")
    expected_1 = (total_freq * c1 / grand).alias("expected_1")
    df = df.withColumns({"expected_0": expected_0, "expected_1": expected_1})

    e0 = F.col("expected_0")
    e1 = F.col("expected_1")
    ll_0 = F.when(fr0 > 0, fr0 * F.log(fr0 / F.greatest(e0, F.lit(1e-10)))).otherwise(
        0.0
    )
    ll_1 = F.when(fr1 > 0, fr1 * F.log(fr1 / F.greatest(e1, F.lit(1e-10)))).otherwise(
        0.0
    )
    llv = (F.lit(2.0) * (ll_0 + ll_1)).alias("log_likelihood_llv")
    df = df.withColumn("log_likelihood_llv", llv)

    ll = F.col("log_likelihood_llv")
    # dof = 1 (polars_text/token_frequencies.py:117-125)
    df = df.withColumn("bayes_factor_bic", ll - F.log(grand))

    # ANSI note: Spark 4 runs with ansi.enabled=true, where double
    # division by zero THROWS instead of yielding Polars' inf/NaN. The
    # divisor here is 0 exactly when min_expected == 1 (ln(1) == 0) —
    # a reachable edge (e.g. total_freq * c / grand == 1). try_divide
    # + explicit inf/NaN fallback reproduces the reference's float
    # semantics (polars_text/token_frequencies.py:127-141).
    min_expected = F.least(e0, e1)
    ell_divisor = grand * F.log(F.greatest(min_expected, F.lit(1e-10)))
    ell_value = F.coalesce(
        F.try_divide(ll, ell_divisor),
        F.when(ll > 0, F.lit(float("inf")))
        .when(ll < 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan"))),
    )
    df = df.withColumn(
        "effect_size_ell",
        F.when(min_expected > 0, ell_value).otherwise(0.0),
    )

    # Significance stars at the chi-square critical values (:143-156).
    df = df.withColumn(
        "significance",
        F.when(ll >= 15.13, "****")
        .when(ll >= 10.83, "***")
        .when(ll >= 6.63, "**")
        .when(ll >= 3.84, "*")
        .otherwise(""),
    )

    # try_divide everywhere a ratio's divisor can be 0 on some row:
    # ANSI Spark may evaluate a shared subexpression outside its
    # when() guard (subexpression elimination), so guards alone don't
    # make `/` safe. The when() guards still define the reference's
    # null semantics; try_divide only defuses the evaluation.
    rate0 = F.try_divide(fr0, c0)
    rate1 = F.try_divide(fr1, c1)
    df = df.withColumns(
        {
            "percent_corpus_0": (rate0 * 100).alias("percent_corpus_0"),
            "percent_corpus_1": (rate1 * 100).alias("percent_corpus_1"),
            # Raw proportion difference, NOT x100, despite the name —
            # reference quirk preserved (:182-185).
            "percent_diff": rate0 - rate1,
            "relative_risk": F.when(
                fr1 > 0, F.try_divide(rate0, rate1)
            ).otherwise(F.lit(None)),
            "log_ratio": F.when(
                (fr0 > 0) & (fr1 > 0), F.log(F.try_divide(rate0, rate1))
            ).otherwise(F.lit(None)),
            "odds_ratio": F.when(
                (fr0 > 0) & (fr1 > 0) & (c1 > fr1) & (c0 > fr0),
                F.try_divide(fr0 * (c1 - fr1), fr1 * (c0 - fr0)),
            ).otherwise(F.lit(None)),
        }
    )
    return df.select(*STATS_COLUMNS)


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    *,
    model: str,
) -> DataFrame:
    """Tokenizer-QA metric table per ``group_col`` (typically
    language): fertility (subword tokens per whitespace word), chars
    per token, and bytes per token — the standard diagnostics for
    whether a tokenizer under-serves a language (high fertility on a
    language means its documents burn more sequence length per word,
    skewing any token-budgeted mixture toward it).

    Returns ``(group, n_docs, n_words, n_tokens, n_chars, n_bytes,
    fertility, chars_per_token, bytes_per_token)``. Ratio columns are
    null when the denominator is 0 (e.g. a group whose docs tokenize
    to nothing).

    Execution: NO explode — per-doc token counts are ``size(tokenize)``
    in the scan projection, so the only movement is the map-side
    combining groupBy on the handful of group keys. The counts are
    exact longs; the ratios divide exact sums, so any SQL engine
    replays them bit-for-bit.
    """
    from polars_text_spark.functions.analysis import token_count_ws

    c = F.col(text_col)
    per_doc = df.where(c.isNotNull()).select(
        F.col(group_col).alias("group"),
        F.size(tokenize(text_col, model=model)).alias("toks"),
        token_count_ws(text_col).alias("words"),
        F.length(c).alias("chars"),
        F.octet_length(c).alias("bytes"),
    )
    agg = per_doc.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").cast("long").alias("n_words"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.sum("chars").cast("long").alias("n_chars"),
        F.sum("bytes").cast("long").alias("n_bytes"),
    )
    def ratio(num, den):
        return F.when(
            F.col(den) > 0,
            F.col(num).cast("double") / F.col(den).cast("double"),
        ).otherwise(F.lit(None))

    return agg.select(
        "group",
        "n_docs",
        "n_words",
        "n_tokens",
        "n_chars",
        "n_bytes",
        ratio("n_tokens", "n_words").alias("fertility"),
        ratio("n_chars", "n_tokens").alias("chars_per_token"),
        ratio("n_bytes", "n_tokens").alias("bytes_per_token"),
    )
