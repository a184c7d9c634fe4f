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

__all__ = [
    "FilterRule",
    "apply_filter_rules",
    "c4_clean_lines",
    "with_c4_tags",
    "with_gopher_tags",
]


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


_C4_POLICY_PHRASES = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)


def c4_clean_lines(
    col: Column | str,
    *,
    min_words: int = 5,
) -> Column:
    """C4-style LINE-level cleanup (Raffel et al. 2020 §2.2, the
    rules the C4 corpus applied before its page filters), as one
    map-only expression: split on newlines, keep only lines that

    - end in a terminal punctuation mark (``. ! ?`` or a closing
      double quote — C4's exact set),
    - carry at least ``min_words`` whitespace words,
    - do not mention ``javascript`` (case-folded — the "enable
      javascript" boilerplate), and
    - do not contain a policy phrase (``terms of use`` / ``privacy
      policy`` / ``cookie policy`` / ``uses cookies`` /
      ``use of cookies`` / ``use cookies`` — C4's published set),

    then rejoin with newlines. Null in, null out; a page with no
    surviving line becomes the empty string (the page-level
    ``min_sentences`` tag downstream is what actually drops it).

    Whole pipeline-stage cost is the split/filter/join expression
    inside the scan projection — no UDF, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda ln: _c4_line_ok(ln, min_words),
    )
    return F.when(c.isNotNull(), F.array_join(kept, "\n"))


def _c4_line_ok(ln: Column, min_words: int) -> Column:
    t = F.trim(ln)
    low = F.lower(t)
    ends_ok = (
        t.endswith(".")
        | t.endswith("!")
        | t.endswith("?")
        | t.endswith('"')
    )
    words = F.size(
        F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
    )
    policy = F.lit(False)
    for phrase in _C4_POLICY_PHRASES:
        policy = policy | low.contains(phrase)
    return (
        ends_ok
        & (words >= F.lit(int(min_words)))
        & ~low.contains("javascript")
        & ~policy
    )


def with_c4_tags(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    bad_words: Sequence[str] = (),
    prefix: str = "rule_",
    keep_col: str = "keep",
    clean_col: str = "c4_text",
) -> DataFrame:
    """The C4 page-filter battery over :func:`c4_clean_lines` output
    (staged once as ``clean_col``): tags + conjunction verdict in the
    ``apply_filter_rules`` shape, so rejected pages stay inspectable.

    - ``min_sentences``: the CLEANED page still has >= ``min_sentences``
      sentence terminators (C4 dropped pages with fewer than 3
      sentences after line filtering);
    - ``no_lorem_ipsum``: page does not contain ``lorem ipsum``
      (case-folded);
    - ``no_curly_brace``: page does not contain ``{`` (C4's
      drop-code heuristic);
    - ``no_bad_words``: no case-folded whitespace token of the RAW
      page equals an entry of ``bad_words`` (C4 used the public
      "List of Dirty, Naughty, Obscene..." blocklist; ship your own
      list — an empty default skips the rule rather than pretending
      an empty blocklist vets anything).

    Map-only like the Gopher battery: one projection, every predicate
    a Catalyst expression in whole-stage codegen."""
    require_free_columns(df, (clean_col, "__c4_low"), "with_c4_tags")
    d = df.withColumn(
        clean_col, c4_clean_lines(text_col, min_words=min_words_per_line)
    ).withColumn("__c4_low", F.lower(F.col(clean_col)))
    low = F.col("__c4_low")
    # count TERMINATORS (not split segments): every kept line ends in
    # one (or a closing quote), so terminator count == sentence count
    # and replays in any engine as a regexp count
    sentences = F.regexp_count(low, F.lit(r"[.!?]"))
    rules = [
        FilterRule("min_sentences", sentences >= F.lit(int(min_sentences))),
        FilterRule("no_lorem_ipsum", ~low.contains("lorem ipsum")),
        FilterRule("no_curly_brace", ~low.contains("{")),
    ]
    if bad_words:
        raw_toks = F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"),
            lambda t: t != F.lit(""),
        )
        bad = [w.lower() for w in bad_words]
        rules.append(
            FilterRule(
                "no_bad_words",
                ~F.exists(raw_toks, lambda t: t.isin(*bad)),
            )
        )
    return apply_filter_rules(
        d, rules, prefix=prefix, keep_col=keep_col
    ).drop("__c4_low")


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
