"""Scalar text ops as pure built-in Column expressions — zero UDFs.

Semantics replicate the reference exactly (citations into
/root/reference):

- ``clean_text``      — src/expressions.rs:53-79,105-107
- ``word_count``      — src/expressions.rs:114-151 (CJK heuristic)
- ``char_count``      — src/expressions.rs:153-156
- ``sentence_count``  — src/expressions.rs:163-184

Because these compile to Catalyst expressions (lower/regexp_replace/
split/length/when), they stay inside whole-stage codegen, survive
predicate/limit pushdown, and cost nothing at 100 TB beyond the scan.

Null semantics (src/expressions.rs:88,100; tests/test_polars_text_utils.py):
``clean_text(null) -> ""``; all counts ``null -> 0``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "char_count",
    "clean_text",
    "sentence_count",
    "sentence_segments",
    "word_count",
]

# ASCII punctuation (the four ASCII ranges) + ASCII digits, as one Java
# regex character class. Mirrors Rust `is_ascii_punctuation() ||
# is_ascii_digit()` (src/expressions.rs:57-61).
_ASCII_PUNCT_DIGIT = r"[!-/:-@\[-`{-~0-9]"

# Unicode whitespace (Rust char::is_whitespace == Unicode White_Space).
# Java regex exposes it as the IsWhite_Space binary property; plain \s
# would be ASCII-only and miss e.g. U+3000 IDEOGRAPHIC SPACE.
_WS = r"\p{IsWhite_Space}"

# "CJK word characters": Han + Ext-A + Ext-B + Hiragana + Katakana +
# Hangul syllables (src/expressions.rs:114-124). \x{20000}-\x{2A6DF}
# is supplementary-plane Ext-B, which Java char classes support.
_CJK_CLASS = (
    r"[一-鿿㐀-䶿\x{20000}-\x{2A6DF}"
    r"぀-ゟ゠-ヿ가-힯]"
)

# Sentence terminators: ASCII . ! ? + CJK full-width + Arabic full
# stop/question + Devanagari danda/double danda (src/expressions.rs:163-172).
_SENTENCE_TERMINATORS = "[.!?。！？۔؟।॥]"

# The full Unicode White_Space=Yes set, spelled as explicit code
# points: Java's \p{IsWhite_Space} matches exactly these 25 chars,
# but RE2 (the DuckDB oracle) has no White_Space property — an
# explicit class is the only form BOTH engines read identically.
UNICODE_WHITESPACE = "".join(
    chr(c)
    for c in (
        [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680]
        + list(range(0x2000, 0x200B))
        + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
    )
)

# "has sentence content": at least one char that is neither Unicode
# whitespace nor a terminator. Shared (via import) with the DuckDB
# oracle SQL so the two engines cannot drift.
SENTENCE_CONTENT_CLASS = (
    "[^" + UNICODE_WHITESPACE + ".!?。！？۔؟।॥]"
)


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _trimmed(c: Column) -> Column:
    # Unicode-whitespace trim (Rust str::trim); Spark's trim() only
    # strips ASCII space.
    return F.regexp_replace(c, f"^{_WS}+|{_WS}+$", "")


def clean_text(col: Column | str) -> Column:
    """Lowercase; ASCII punctuation/digits -> space; collapse whitespace
    runs to a single space; trim. Non-ASCII punctuation/digits untouched.
    """
    c = _col(col)
    cleaned = F.lower(c)
    cleaned = F.regexp_replace(cleaned, _ASCII_PUNCT_DIGIT, " ")
    cleaned = F.regexp_replace(cleaned, f"{_WS}+", " ")
    cleaned = F.trim(cleaned)  # after collapsing, edges are ASCII spaces
    return F.coalesce(cleaned, F.lit("")).alias("clean_text")


def word_count(col: Column | str) -> Column:
    """Whitespace-token count; pure-CJK runs count per character; a single
    non-CJK run counts 1; empty/null -> 0.
    """
    c = _col(col)
    t = _trimmed(c)
    return (
        F.when(c.isNull() | (t == ""), F.lit(0).cast("long"))
        .when(t.rlike(_WS), F.size(F.split(t, f"{_WS}+")).cast("long"))
        .when(t.rlike(f"^{_CJK_CLASS}+$"), F.length(t).cast("long"))
        .otherwise(F.lit(1).cast("long"))
        .alias("word_count")
    )


def char_count(col: Column | str) -> Column:
    """Unicode scalar count (Spark ``length`` counts code points)."""
    c = _col(col)
    return F.coalesce(F.length(c).cast("long"), F.lit(0).cast("long")).alias(
        "char_count"
    )


def sentence_count(col: Column | str) -> Column:
    """Split on the terminator set; count segments containing any
    non-whitespace character.
    """
    c = _col(col)
    segments = F.split(c, _SENTENCE_TERMINATORS)
    n = F.size(F.filter(segments, lambda s: s.rlike(r"[^\p{IsWhite_Space}]")))
    return F.coalesce(n.cast("long"), F.lit(0).cast("long")).alias("sentence_count")


def sentence_segments(col: Column | str) -> Column:
    """``array<string>`` of sentences: maximal runs of non-terminator
    text plus their closing terminator run, space-trimmed, with
    content-free pieces (only terminators/blank) dropped — so
    ``size(sentence_segments(x)) == sentence_count(x)`` by
    construction (pinned in tests). The splitting op
    :func:`sentence_count` only counts; pipelines that CHUNK by
    sentence (bitext alignment, context-window packing, per-sentence
    quality) need the segments themselves.

    Portability is deliberate: the pattern is one alternation of
    explicit character classes (same terminator set as
    ``sentence_count``) with leftmost-first alternation semantics,
    which Java regex and RE2 share — a DuckDB oracle replays the
    exact segmentation. No lookarounds (RE2 has none), no ``\\s`` or
    ``\\p{IsWhite_Space}`` (engine-divergent): the content filter
    spells out the complete Unicode White_Space set
    (``SENTENCE_CONTENT_CLASS``), keeping the count invariant true
    on NBSP/ideographic-space-laden web text too."""
    c = _col(col)
    pat = r"[^.!?。！？۔؟।॥]*[.!?。！？۔؟।॥]+|[^.!?。！？۔؟।॥]+"
    segs = F.regexp_extract_all(c, F.lit(pat), F.lit(0))
    # unary lambda, NOT bare F.trim: transform also passes the element
    # index, which trim would silently take as its trim-CHARACTER set
    segs = F.transform(segs, lambda s: F.trim(s))
    segs = F.filter(segs, lambda s: s.rlike(SENTENCE_CONTENT_CLASS))
    return F.coalesce(
        segs, F.array().cast("array<string>")
    ).alias("sentence_segments")
