"""Text-analysis functions for large-scale training-data pipelines.

Beyond-reference operators (BASELINE.json north star): language ID,
quality scoring, token counting, and document fingerprinting — all
pure built-in Column expressions so they run JVM-side inside
whole-stage codegen and cost ~nothing at 100 TB beyond the scan.
Every one of them has an exact DuckDB-SQL oracle.
"""

from __future__ import annotations

import unicodedata
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from polars_text_spark.functions.scalar import clean_text

__all__ = [
    "compression_ratio",
    "CODE_PATTERNS",
    "STOPWORDS",
    "char_class_ratios",
    "char_entropy",
    "code_signals",
    "dehyphenate",
    "detect_language",
    "doc_fingerprint",
    "dup_word_frac",
    "hashed_classifier_score",
    "license_signals",
    "LICENSE_PATTERNS",
    "line_stats",
    "mojibake_signals",
    "normalize_text",
    "quality_score",
    "readability",
    "remove_stopwords",
    "token_count_bpe",
    "word_ngram_array",
    "ws_token_array",
    "token_count_ws",
]

# Small, high-frequency stopword inventories. Deliberately tiny: the
# heuristic scores whitespace tokens against each list and picks the
# argmax, which is robust at document length and cheap at scale.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "ich", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "pas", "que", "pour", "dans"),
    "es": ("el", "la", "los", "y", "es", "una", "no", "que", "por", "como"),
}

_CJK_ANY = r"[一-鿿㐀-䶿぀-ゟ゠-ヿ가-힯]"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _ws_tokens(c: Column) -> Column:
    t = F.trim(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def ws_token_array(col: Column | str) -> Column:
    """THE portable whitespace tokenizer: lowercase + trim + ``\\s+``
    split, empties removed. The single definition shared by the
    corpus-statistics operators (linguistics, quality) so the
    cross-module token contract cannot drift; the SQL-oracle twin is
    ``queries._SQL_WS_TOKS``."""
    c = _col(col)
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit("")
    )


def word_ngram_array(toks: Column, n: int) -> Column:
    """Space-joined word ``n``-grams of a token array (map-only:
    ``transform(sequence(...)) + slice``); empty array below ``n``
    tokens. Shared by ngram_counts / doc_ngram_novelty so the two
    operators' n-gram definition stays identical."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _stopword_hits(tokens: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens, lambda x: x.isin(*words)))


def detect_language(col: Column | str) -> Column:
    """Heuristic language ID over {en,de,fr,es,zh,unknown}.

    CJK-character presence wins first (zh); otherwise the language with
    the most stopword hits among the lowercased whitespace tokens;
    ``unknown`` when nothing matches. Pure built-ins -> SQL-expressible
    for the DuckDB oracle and free at scale.
    """
    c = F.lower(_col(col))
    tokens = _ws_tokens(c)
    hits = {lang: _stopword_hits(tokens, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when(c.isNull(), F.lit("unknown")).when(
        c.rlike(_CJK_ANY), F.lit("zh")
    )
    expr = expr.when(best <= 0, F.lit("unknown"))
    # Deterministic tie-break: alphabetical language order.
    for lang in sorted(STOPWORDS):
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("unknown")).alias("lang_detected")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count; empty/null -> 0."""
    c = _col(col)
    return F.coalesce(F.size(_ws_tokens(c)), F.lit(0)).cast("long").alias(
        "token_count_ws"
    )


# BPE-ish pre-tokenization: letter runs, digit runs, and
# non-space symbol runs each count as one token — the GPT-2 regex
# family minus lookarounds (RE2, for the DuckDB oracle, has none).
_BPE_ISH = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"


def token_count_bpe(col: Column | str) -> Column:
    """Approximate subword-count via the BPE-ish regex; ~upper-bounds
    real BPE token counts within a small constant."""
    c = _col(col)
    return F.coalesce(F.regexp_count(c, F.lit(_BPE_ISH)), F.lit(0)).cast(
        "long"
    ).alias("token_count_bpe")


def quality_score(col: Column | str) -> Column:
    """Composite document-quality score in [0,1].

    Components (equal-weight mean):
    - alpha ratio: letter chars / total chars;
    - non-punct ratio: 1 - punctuation chars / total chars;
    - stopword ratio hit: fraction of tokens that are EN stopwords,
      clipped to [0, 0.4] and rescaled (natural prose sits ~0.2-0.4);
    - length band: 1 when 20 <= char_count <= 10000, linear falloff
      below/above.

    All built-ins; identical math runs in the DuckDB oracle.
    """
    c = _col(col)
    n = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^\p{L}]", "")).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^\p{P}]", "")).cast("double")
    tokens = _ws_tokens(F.lower(c))
    n_tokens = F.size(tokens).cast("double")
    stop_hits = _stopword_hits(tokens, "en").cast("double")

    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    non_punct_ratio = F.when(n > 0, F.lit(1.0) - punct / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    stop_component = F.least(stop_ratio, F.lit(0.4)) / F.lit(0.4)
    length_component = (
        F.when(n < 20, n / F.lit(20.0))
        .when(n > 10000, F.greatest(F.lit(0.0), F.lit(2.0) - n / F.lit(10000.0)))
        .otherwise(F.lit(1.0))
    )
    score = (alpha_ratio + non_punct_ratio + stop_component + length_component) / F.lit(
        4.0
    )
    return (
        F.when(c.isNull(), F.lit(0.0)).otherwise(F.coalesce(score, F.lit(0.0)))
    ).alias("quality_score")


def normalize_text(col: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (NFC/NFD/NFKC/NFKD).

    Spark has no built-in Unicode normalization, so this is an
    Arrow-batched pandas UDF over ``unicodedata.normalize`` —
    elementwise and deterministic, so pushdown still applies. Null
    passes through as null.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form '{form}'")

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield series.map(
                lambda s: unicodedata.normalize(form, s) if s is not None else None
            )

    c = _col(col)
    return F.pandas_udf(fn, "string")(c).alias("normalized")


def compression_ratio(col: Column | str, *, level: int = 6) -> Column:
    """Per-document zlib compressibility as a struct ``(n_bytes,
    n_compressed, ratio)`` — ``ratio`` = deflated size over UTF-8
    size. The classic redundancy gate (Dolma/Gopher family): template
    floods and boilerplate compress far below natural text (~0.3-0.6),
    random noise sits near (or above) 1.0.

    No SQL engine exposes deflate, so this is the honest slow path: an
    Arrow-batched pandas UDF (elementwise + deterministic — pushdown
    still applies, stream-safe). pytest-verified rather than
    oracle-replayed, like the multimodal parsers. Null in, null
    fields; empty text -> ratio 0.0 by convention."""
    import zlib

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        def one(s: str | None):
            if s is None:
                return {"n_bytes": None, "n_compressed": None, "ratio": None}
            raw = s.encode("utf-8")
            if not raw:
                return {"n_bytes": 0, "n_compressed": 0, "ratio": 0.0}
            comp = len(zlib.compress(raw, level))
            return {
                "n_bytes": len(raw),
                "n_compressed": comp,
                "ratio": comp / len(raw),
            }

        for series in batches:
            yield pd.DataFrame([one(v) for v in series])

    c = _col(col)
    return F.pandas_udf(
        fn,
        "n_bytes long, n_compressed long, ratio double",
    )(c).alias("compression_ratio")


def remove_stopwords(
    tokens_col: Column | str, stopwords=None, *, field: str | None = None
) -> Column:
    """Drop stopwords from a token array — pure built-in ``filter``
    (JVM-side). ``stopwords`` is a list of words or a language key from
    :data:`STOPWORDS` (default ``"en"``). For ``array<struct>`` token
    columns (the tokenize output), pass ``field="token"`` to filter on
    that struct field while keeping the offsets."""
    if stopwords is None or isinstance(stopwords, str):
        stopwords = STOPWORDS[stopwords or "en"]
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    words = list(stopwords)
    if field is not None:
        return F.filter(c, lambda x: ~x[field].isin(*words)).alias("tokens")
    return F.filter(c, lambda x: ~x.isin(*words)).alias("tokens")


def dup_word_frac(col: Column | str) -> Column:
    """Word-repetition signal (Gopher-style quality filter): fraction
    of whitespace tokens that are repeats of an earlier token,
    ``1 - distinct/total``. Empty/null -> 0.0. Pure built-ins."""
    c = _col(col)
    toks = _ws_tokens(F.lower(c))
    n = F.size(toks).cast("double")
    frac = F.when(n <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n
    )
    return F.when(c.isNull(), F.lit(0.0)).otherwise(frac).alias("dup_word_frac")


def line_stats(col: Column | str) -> Column:
    """Line-level quality signals (Gopher-style heuristics, which are
    defined over LINES, unlike the doc-level ratios above): ``struct(
    n_lines, blank_ratio, bullet_ratio, ellipsis_ratio,
    mean_line_len)``.

    - ``bullet_ratio``: fraction of non-blank lines starting with a
      bullet marker (``-``, ``*``, ``•`` + space) — Gopher drops docs
      with >90% bullet lines;
    - ``ellipsis_ratio``: fraction of non-blank lines ending in
      ``...`` or ``…`` — Gopher drops >30%;
    - ``blank_ratio``: blank lines / all lines;
    - ``mean_line_len``: mean raw character length over all lines.

    Split + higher-order ``filter``/``aggregate`` built-ins — one
    projection, no explode, no shuffle. NULL text -> NULL struct.
    """
    c = _col(col)
    lines = F.split(c, "\n")
    n = F.size(lines).cast("double")
    # lambda, NOT a bare F.trim reference: trim() has an optional
    # second param (the charset), so transform() would bind the
    # element INDEX to it and silently not trim
    trimmed = F.transform(lines, lambda x: F.trim(x))
    nonblank = F.filter(trimmed, lambda x: x != F.lit(""))
    n_nb = F.size(nonblank).cast("double")
    bullets = F.size(
        F.filter(
            nonblank,
            lambda x: x.startswith("- ") | x.startswith("* ") | x.startswith("• "),
        )
    ).cast("double")
    ellipsis = F.size(
        F.filter(nonblank, lambda x: x.endswith("...") | x.endswith("…"))
    ).cast("double")
    total_len = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ).cast("double")
    ratio = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    stats = F.struct(
        F.size(lines).cast("long").alias("n_lines"),
        ratio(n - n_nb, n).alias("blank_ratio"),
        ratio(bullets, n_nb).alias("bullet_ratio"),
        ratio(ellipsis, n_nb).alias("ellipsis_ratio"),
        ratio(total_len, n).alias("mean_line_len"),
    )
    # without the guard the struct itself is non-null for NULL text
    # (each field independently nulls/zeroes out)
    return F.when(c.isNotNull(), stats)


def hashed_classifier_score(
    col: Column | str,
    *,
    weights: list[float] | None = None,
    n_buckets: int = 4096,
    bias: float = 0.0,
    threshold: float = 0.0,
) -> Column:
    """Hashing-trick linear text classifier (the fastText-style
    model-based quality filter of CCNet/LLaMA-class pipelines):
    every token hashes into one of ``n_buckets`` feature buckets, the
    document's score is the MEAN bucket weight plus ``bias``, and
    ``keep`` thresholds that margin.

    Returns ``struct(margin double, keep boolean)`` with ``margin``
    rounded to 6 dp and ``keep = n_tokens > 0 AND margin >=
    threshold`` (empty/null docs never pass a quality filter).

    Pass ``weights`` (length ``n_buckets``, learned offline) to run a
    real model — the vector rides into the plan as a literal array
    (kilobytes, the broadcast-as-literal pattern used for k-means
    centroids), so scoring is one map-only whole-stage-codegen
    projection: no shuffle, no UDF, no join. With ``weights=None`` the
    weight of bucket j derives deterministically from
    sha256('w:' || j) in [-1, 1] — a stand-in that exercises the
    identical plan AND is re-derivable by a SQL oracle.

    Everything is a sequential left fold over the token array, so a
    differential engine computes bit-identical margins (see
    operators/semdedup.py for the determinism contract).
    """
    if weights is not None and len(weights) != n_buckets:
        raise ValueError(
            f"weights must have length n_buckets={n_buckets}, "
            f"got {len(weights)}"
        )
    from polars_text_spark.operators.dedup import sha_token_hash
    from polars_text_spark.plans.exprs import let

    c = _col(col)
    bucket = lambda t: sha_token_hash(F.concat(F.lit("b:"), t)) % n_buckets  # noqa: E731
    if weights is None:

        def w_of(t):
            j = bucket(t).cast("string")
            return (
                sha_token_hash(F.concat(F.lit("w:"), j)) % 2000001
            ) / 1000000.0 - 1.0

    else:
        lit_w = F.array(*[F.lit(float(w)) for w in weights])

        def w_of(t):
            return F.element_at(lit_w, bucket(t).cast("int") + 1)

    toks = F.when(
        c.isNotNull(),
        F.filter(
            F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != F.lit("")
        ),
    ).otherwise(F.array().cast("array<string>"))

    def body(tk):
        n = F.size(tk)
        z = (
            F.when(
                n > 0,
                F.aggregate(
                    F.transform(tk, w_of), F.lit(0.0), lambda a, x: a + x
                )
                / n.cast("double"),
            ).otherwise(F.lit(0.0))
            + F.lit(float(bias))
        )

        def with_z(zz):
            return F.struct(
                F.round(zz, 6).alias("margin"),
                ((n > 0) & (zz >= F.lit(float(threshold)))).alias("keep"),
            )

        return let(z, with_z)

    return let(toks, body)


def readability(col: Column | str) -> Column:
    """Flesch Reading Ease + Flesch-Kincaid grade as a struct
    ``(n_words, n_sentences, n_syllables, flesch, fk_grade)``.

    Classic text-analytics surface (the reference platform's audience
    runs readability over corpora as routinely as frequencies). Syllable
    counting is the standard vowel-group heuristic: per word,
    ``max(1, count of [aeiouy]+ runs)`` — deterministic and
    engine-portable (``size(split(w, '[aeiouy]+')) - 1`` counts the
    runs, since a split always yields matches+1 pieces).

    Pure Catalyst, map-only. Docs with zero words or zero sentences
    yield null scores (the formulas divide by both). Scores are LEFT
    UNROUNDED — callers round; the arithmetic is written in the same
    operation order as the SQL oracle so values match bit for bit.
    """
    c = _col(col)
    # ws_token_array is the shared empty-filtered contract (also used by
    # the readability_scores DuckDB oracle and the pt_* SQL UDFs) — the
    # unfiltered _ws_tokens would count a phantom empty token for text
    # with leading/trailing tabs or newlines.
    toks = ws_token_array(c)
    n_words = F.size(toks).cast("long")
    # sentence_count shares the scalar.py contract (reference op #4)
    from polars_text_spark.functions.scalar import sentence_count

    n_sent = sentence_count(c).cast("long")
    syl = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1), F.size(F.split(w, "[aeiouy]+")) - 1
        ).cast("long"),
    )
    wd = n_words.cast("double")
    sd = n_sent.cast("double")
    yd = syl.cast("double")
    ok = (n_words > 0) & (n_sent > 0)
    flesch = F.when(
        ok,
        F.lit(206.835) - F.lit(1.015) * (wd / sd) - F.lit(84.6) * (yd / wd),
    )
    fk = F.when(
        ok,
        F.lit(0.39) * (wd / sd) + F.lit(11.8) * (yd / wd) - F.lit(15.59),
    )
    return F.struct(
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        syl.alias("n_syllables"),
        flesch.alias("flesch"),
        fk.alias("fk_grade"),
    ).alias("readability")


def char_entropy(col: Column | str) -> Column:
    """Per-document Shannon entropy over characters (bits/char).

    A classic quality/anomaly signal: natural prose sits around 4-4.5
    bits/char, base64 or hex blobs and keyboard-mash spam sit far
    higher or lower. Computed in an Arrow-batched pandas UDF — a
    MAP-ONLY design with zero shuffle (the pure-Catalyst alternative,
    explode chars + two groupBys, would shuffle the full character
    stream twice just to build per-row histograms).

    Engine-stable contract for the SQL oracle: the probability terms
    ``(c/n) * log2(c/n)`` are accumulated in ASCENDING CHARACTER ORDER
    and the sign flipped as ``0.0 - acc`` (never ``-acc``, which turns
    the single-character document's 0.0 into -0.0). DuckDB replays the
    identical order via ``list_sum(list_transform(list(cnt ORDER BY c),
    ...))`` — the same IEEE additions in the same order, so values
    match bit for bit before any rounding. Null in, null out; empty
    string scores 0.0.
    """
    c = _col(col)
    return F.pandas_udf(_char_entropy_fn(), "double")(c).alias("char_entropy")


def _char_entropy_fn():
    """Arrow-batched body of :func:`char_entropy` (shared with the
    ``pt_char_entropy`` SQL registration in sql.py)."""
    import math
    from collections import Counter

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(s):
            if s is None:
                return None
            n = len(s)
            if n == 0:
                return 0.0
            cnt = Counter(s)
            acc = 0.0
            for ch in sorted(cnt):
                p = cnt[ch] / n
                acc += p * math.log2(p)
            return 0.0 - acc

        for series in batches:
            yield series.map(one)

    return fn


def char_class_ratios(col: Column | str) -> Column:
    """ASCII character-class ratios as a struct
    ``(n_chars, digit_ratio, upper_ratio, space_ratio)``.

    Pure Catalyst (regexp strip + length), map-only; ratios are plain
    double divisions so any SQL engine reproduces them bit for bit.
    Empty string yields 0.0 ratios; null in, null struct fields out.
    """
    c = _col(col)
    n = F.length(c)
    nd = n.cast("double")

    def ratio(pattern: str) -> Column:
        stripped = F.length(F.regexp_replace(c, pattern, ""))
        return F.when(n == 0, F.lit(0.0)).otherwise(
            stripped.cast("double") / nd
        )

    return F.struct(
        n.cast("long").alias("n_chars"),
        ratio("[^0-9]").alias("digit_ratio"),
        ratio("[^A-Z]").alias("upper_ratio"),
        ratio(r"[^\s]").alias("space_ratio"),
    ).alias("char_class_ratios")


def dehyphenate(col: Column | str) -> Column:
    """Join hyphen-linebreak word splits (``"exam-\\nple"`` ->
    ``"example"``) — the standard OCR/PDF line-wrap repair pass that
    runs before tokenization in a scanned-document pipeline (an
    unrepaired split inflates the vocabulary with both halves of every
    wrapped word).

    Conservative contract: joins ONLY letter ``-`` newline
    (+ optional indent) letter — numeric ranges (``3-\\n4``),
    em-dash-ish punctuation runs, and blank-line-separated hyphens are
    untouched. Both LF and CRLF line breaks repair (scanned-document
    corpora are routinely Windows-line-ended; an LF-only pattern would
    silently zero-repair them). Pure ``regexp_replace`` (map-only,
    fused into the scan); the same pattern replays in any
    RE2/Java-regex engine."""
    c = _col(col)
    return F.regexp_replace(
        c, r"(\p{L})-\r?\n[ \t]*(\p{L})", "$1$2"
    ).alias("dehyphenated")


def mojibake_signals(col: Column | str) -> Column:
    """Encoding-damage heuristics as a struct ``(n_chars,
    n_replacement, n_c1_controls, n_artifacts, score)`` — the
    web-corpus quality gate for text that survived a bad
    decode/re-encode cycle:

    - ``n_replacement`` — U+FFFD replacement characters (a decoder
      already gave up);
    - ``n_c1_controls`` — C1 control chars U+0080–U+009F (the classic
      cp1252-bytes-decoded-as-latin-1 residue);
    - ``n_artifacts`` — occurrences of the UTF-8-double-decode
      signatures ``Ã`` / ``â€`` / ``Â`` (how ``é``, smart quotes, and
      NBSP read after a second decode). A HEURISTIC: rare-but-legal in
      real Portuguese/French text (``Ã`` alone ends a word in pt),
      hence a score to threshold on, not a verdict.

    ``score`` = damaged chars over total. Pure Catalyst
    (``regexp_count``), map-only; the identical patterns run in any
    RE2/Java-regex SQL engine, so the oracle replays every count.
    Null in, null fields out; empty string scores 0.0.
    """
    c = _col(col)
    n = F.length(c)
    # patterns from code points: artifact literals in source are one
    # bad editor round-trip away from silently diverging from the
    # oracle's chr() chains
    n_rep = F.regexp_count(c, F.lit(chr(0xFFFD)))
    n_c1 = F.regexp_count(c, F.lit("[\\x80-\\x9F]"))
    n_art = F.regexp_count(
        c,
        F.lit(chr(0xC3) + "|" + chr(0xE2) + chr(0x20AC) + "|" + chr(0xC2)),
    )
    score = F.when(n == 0, F.lit(0.0)).otherwise(
        (n_rep + n_c1 + n_art).cast("double") / n.cast("double")
    )
    return F.struct(
        n.cast("long").alias("n_chars"),
        n_rep.cast("long").alias("n_replacement"),
        n_c1.cast("long").alias("n_c1_controls"),
        n_art.cast("long").alias("n_artifacts"),
        score.alias("score"),
    ).alias("mojibake_signals")


# Code-vs-prose patterns. Module constants: the oracle SQL is BUILT
# from these strings (the LICENSE_PATTERNS precedent), so Spark (Java
# regex) and DuckDB (RE2) are character-identical by construction —
# (?m), \b and plain alternation are portable; no backrefs/lookaround.
CODE_PATTERNS = {
    # markdown/forum code fences
    "n_fences": "```",
    # reserved words across the mainstream languages; a HEURISTIC
    # ("class", "return" occur in prose) — hence a score, not a verdict
    "n_keywords": (
        "\\b(?:def|return|import|function|var|const|class|void|static"
        "|lambda|elif|printf|include|struct|typedef|async|await"
        "|foreach|endif|nullptr|bool)\\b"
    ),
    # structural symbols rare in running prose
    "n_symbols": "[{}\\[\\]();<>=#|&$]",
    # snake_case / camelCase identifiers
    "n_identifiers": (
        "\\b[a-z]+(?:_[a-z0-9]+)+\\b|\\b[a-z]+[A-Z][A-Za-z0-9]*\\b"
    ),
    # lines opening with a tab or 4+ spaces (code indentation)
    "n_indented": "(?m)^(?:\\t| {4})",
}


def code_signals(col: Column | str) -> Column:
    """Code-vs-prose heuristics as a struct ``(n_chars, n_lines,
    n_indented, n_fences, n_keywords, n_symbols, n_identifiers,
    symbol_frac, indent_frac, score)`` — the mixture-curation signal
    that routes a crawl document toward the code or prose bucket (and
    catches code-in-prose contamination like pasted stack traces
    inflating a "books" source).

    ``score`` is a bounded weighted blend: indentation fraction,
    structural-symbol density, keyword+identifier density per ~word
    (chars/5), plus a fence bonus when a fenced block is plausibly
    open+closed (two fences). Weights are fixed constants so the score
    is engine-replayable, NOT a learned classifier — threshold on it,
    or feed the raw counts to :func:`hashed_classifier_score`.

    Pure Catalyst (``regexp_count``), map-only, fused into the scan;
    the identical patterns run in any RE2/Java-regex engine. Null in,
    null fields out; empty string scores 0.0.
    """
    c = _col(col)
    n = F.length(c)
    n_lines = F.when(n == 0, F.lit(0)).otherwise(
        F.regexp_count(c, F.lit("\n")) + 1
    )
    cnt = {
        k: F.regexp_count(c, F.lit(p)) for k, p in CODE_PATTERNS.items()
    }
    symbol_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        cnt["n_symbols"].cast("double") / n.cast("double")
    )
    indent_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        cnt["n_indented"].cast("double") / n_lines.cast("double")
    )
    dens = F.when(n == 0, F.lit(0.0)).otherwise(
        (cnt["n_keywords"] + cnt["n_identifiers"]).cast("double")
        * F.lit(5.0)
        / n.cast("double")
    )
    fence_bonus = F.when(cnt["n_fences"] >= 2, F.lit(0.25)).otherwise(
        F.lit(0.0)
    )
    # least() skips nulls (both engines), so an unguarded null input
    # would "score" 1.0 — gate on the null length explicitly instead.
    score = F.when(n.isNull(), F.lit(None).cast("double")).otherwise(
        F.least(
            F.lit(1.0),
            F.lit(0.35) * indent_frac
            + F.lit(2.0) * symbol_frac
            + F.lit(0.5) * dens
            + fence_bonus,
        )
    )
    return F.struct(
        n.cast("long").alias("n_chars"),
        n_lines.cast("long").alias("n_lines"),
        cnt["n_indented"].cast("long").alias("n_indented"),
        cnt["n_fences"].cast("long").alias("n_fences"),
        cnt["n_keywords"].cast("long").alias("n_keywords"),
        cnt["n_symbols"].cast("long").alias("n_symbols"),
        cnt["n_identifiers"].cast("long").alias("n_identifiers"),
        symbol_frac.alias("symbol_frac"),
        indent_frac.alias("indent_frac"),
        score.alias("score"),
    ).alias("code_signals")


def doc_fingerprint(col: Column | str) -> Column:
    """Content fingerprint: sha2-256 over the normalized
    (:func:`clean_text`) document — the join key for exact/near-dup
    bookkeeping and content-addressed caches (≙ the reference's
    SHA-256 content hashes, src/cache.rs:23-27)."""
    c = _col(col)
    return F.sha2(clean_text(c), 256).alias("fingerprint")


# License-marker patterns, one per family. Module constants: the
# oracle SQL is BUILT from these strings, so Spark (Java regex) and
# DuckDB (RE2) are character-identical by construction — (?i), \b and
# plain alternation are portable across both engines (no backrefs, no
# lookaround).
LICENSE_PATTERNS = {
    # CC family incl. the short "CC BY(-SA/NC/ND)" forms and the
    # license-chooser URL
    "n_creative_commons": (
        "(?i)creative commons|creativecommons\\.org"
        "|\\bCC[ -]BY(?:[ -](?:SA|NC|ND))*\\b"
    ),
    "n_public_domain": "(?i)public domain|\\bCC0\\b|\\bunlicense\\b",
    "n_permissive": (
        "(?i)\\bMIT Licen[cs]e\\b|\\bApache Licen[cs]e\\b"
        "|\\bBSD (?:[23]-Clause )?Licen[cs]e\\b|\\bISC Licen[cs]e\\b"
    ),
    "n_copyleft": (
        "(?i)GNU (?:Lesser |Affero )?General Public Licen[cs]e"
        "|\\b[LA]?GPL(?:v[23]|-[23]\\.[01])?\\b"
        "|Mozilla Public Licen[cs]e"
    ),
    "n_rights_reserved": "(?i)all rights reserved",
}


def license_signals(col: Column | str) -> Column:
    """License-marker scan as a struct of per-family match counts plus
    a ``verdict`` — the training-data governance gate: a corpus built
    from crawled text needs to KNOW which documents carry explicit
    license declarations before a usage decision can exist (the same
    reason code-LM pipelines like The Stack publish per-file license
    tags and filter on them).

    Families (:data:`LICENSE_PATTERNS`): Creative Commons, public
    domain / CC0, permissive code licenses (MIT/Apache/BSD/ISC),
    copyleft (GPL/LGPL/AGPL/MPL), and "all rights reserved".
    ``verdict`` is the most restrictive family present, in the fixed
    priority ``copyleft > rights_reserved > permissive >
    creative_commons > public_domain > none`` — a marker SCAN, not
    legal analysis: it flags declarations for a downstream policy to
    act on.

    Pure Catalyst ``regexp_count``, map-only, fused into the scan;
    identical pattern strings replay in any RE2/Java-regex engine.
    Null in, null fields out."""
    c = _col(col)
    counts = {
        name: F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat in LICENSE_PATTERNS.items()
    }
    verdict = (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(counts["n_copyleft"] > 0, F.lit("copyleft"))
        .when(counts["n_rights_reserved"] > 0, F.lit("rights_reserved"))
        .when(counts["n_permissive"] > 0, F.lit("permissive"))
        .when(counts["n_creative_commons"] > 0, F.lit("creative_commons"))
        .when(counts["n_public_domain"] > 0, F.lit("public_domain"))
        .otherwise(F.lit("none"))
    )
    return F.struct(
        *[col_.alias(name) for name, col_ in counts.items()],
        verdict.alias("verdict"),
    ).alias("license_signals")
