"""Rule-tagger document filtering — the Gopher/Dolma "taggers"
pattern: every heuristic is a named boolean TAG column, the keep
verdict is their conjunction, and rejected docs stay inspectable
(which rule fired) instead of silently vanishing.

Real pipelines (Gopher §A1.1, Dolma, RefinedWeb) tune dozens of such
rules; what matters at 100 TB is that the whole rule battery is ONE
map-only projection — every predicate a Catalyst expression inside
whole-stage codegen, no UDF, no shuffle, tags written alongside the
doc so downstream sampling/ablation can re-slice without re-scanning.

``apply_filter_rules`` is the generic combinator (bring your own
predicates); ``with_gopher_tags`` ships the classic Gopher repetition-
free subset, with the shared token array staged ONCE as a projection
column so N rules don't re-tokenize N times (SCALING.md).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_text_spark.operators._cols import require_free_columns

__all__ = ["FilterRule", "apply_filter_rules", "with_gopher_tags"]


class FilterRule:
    """A named pass/fail predicate (True = document PASSES)."""

    __slots__ = ("name", "predicate")

    def __init__(self, name: str, predicate: Column):
        if not name.isidentifier():
            raise ValueError(f"rule name must be an identifier: {name!r}")
        self.name = name
        self.predicate = predicate


def apply_filter_rules(
    df: DataFrame,
    rules: Sequence[FilterRule],
    *,
    prefix: str = "rule_",
    keep_col: str = "keep",
) -> DataFrame:
    """Append one boolean ``prefix+name`` column per rule plus
    ``keep_col`` = AND of all rules (null predicates count as FAIL —
    a rule that cannot evaluate must not pass a filter)."""
    if not rules:
        raise ValueError("apply_filter_rules: no rules given")
    names = [prefix + r.name for r in rules]
    # one combined report: duplicate/colliding rule columns AND a
    # keep_col collision surface together, not one failure at a time
    collisions = sorted(
        {n for n in names if names.count(n) > 1 or n in df.columns}
        | ({keep_col} if keep_col in df.columns or keep_col in names else set())
    )
    if collisions:
        raise ValueError(
            f"apply_filter_rules: column collisions: {collisions}"
        )
    out = df
    for r, n in zip(rules, names):
        out = out.withColumn(n, F.coalesce(r.predicate, F.lit(False)))
    keep = F.lit(True)
    for n in names:
        keep = keep & F.col(n)
    return out.withColumn(keep_col, keep)


def with_gopher_tags(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    prefix: str = "rule_",
    keep_col: str = "keep",
) -> DataFrame:
    """Gopher §A1.1-style quality tags over whitespace tokens of
    ``lower(trim(text))``:

    - ``token_count``: ``min_tokens <= n <= max_tokens``;
    - ``mean_word_len``: mean token length inside
      ``[min_mean_word_len, max_mean_word_len]``;
    - ``alpha_words``: fraction of tokens containing a letter
      >= ``min_alpha_word_frac``;
    - ``stopwords``: document contains >= ``min_stopword_hits``
      English stop-word occurrences (the Gopher "2 of 8" rule).

    The token array is staged once (``__ft_toks``); each rule reads
    the attribute, so the battery costs one tokenization per row.
    """
    require_free_columns(df, ("__ft_toks",), "with_gopher_tags")
    from polars_text_spark.functions.analysis import STOPWORDS

    d = df.withColumn(
        "__ft_toks",
        F.when(
            F.col(text_col).isNotNull(),
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda t: t != F.lit(""),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    toks = F.col("__ft_toks")
    n = F.size(toks)
    mean_len = F.when(
        n > 0,
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t).cast("long"),
        ).cast("double")
        / n,
    )
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n,
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))
    )
    rules = [
        FilterRule(
            "token_count", (n >= min_tokens) & (n <= max_tokens)
        ),
        FilterRule(
            "mean_word_len",
            (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len),
        ),
        FilterRule("alpha_words", alpha_frac >= min_alpha_word_frac),
        FilterRule("stopwords", stop_hits >= min_stopword_hits),
    ]
    return apply_filter_rules(
        d, rules, prefix=prefix, keep_col=keep_col
    ).drop("__ft_toks")
