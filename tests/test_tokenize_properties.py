"""Property-based tests for the plain-words tokenizer.

Mirrors the reference's property-test strategy (SURVEY.md §5.1): the
fast implementation is checked against a deliberately-naive oracle
(src/offsets.rs:57-165 keeps "the property-test oracle" in-tree), plus
structural invariants over arbitrary unicode text. Pure Python — no
SparkSession, so hypothesis can run hundreds of cases cheaply.
"""

from __future__ import annotations

import regex as _regex
from hypothesis import example, given, settings
from hypothesis import strategies as st

from polars_text_spark.functions.tokenize import (
    _is_special_token,
    plain_word_records,
)

# Character CLASSIFICATION comes from the same Unicode table family the
# engine uses (the third-party `regex` module, Unicode >= 15). CPython's
# `unicodedata` lags (3.11 ships Unicode 14.0), and the two disagree on
# codepoints assigned in between — e.g. U+11F43 KAWI DANDA is \p{P} in
# regex but Cn (unassigned → treated as a word char) in unicodedata 14.
# The engine's split matches modern HF BertPreTokenizer, so the regex
# tables are normative; only the SCANNING LOGIC below stays independent
# of the implementation under test.
_PUNCT_CHAR = _regex.compile(r"\p{P}")
_WS_CHAR = _regex.compile(r"\s")


def _is_bert_punct(ch: str) -> bool:
    # HF BertPreTokenizer punctuation: ASCII punctuation OR Unicode P*.
    if ch in r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""":
        return True
    return _PUNCT_CHAR.fullmatch(ch) is not None


def _is_ws(ch: str) -> bool:
    # regex \s (Unicode White_Space) — what Rust char::is_whitespace
    # uses too. Python str.isspace() is broader: it also counts
    # \x1c-\x1f (bidi separators, NOT White_Space), which would diverge
    # from the reference's splitting. Found by hypothesis.
    return _WS_CHAR.fullmatch(ch) is not None


def naive_records(text: str, remove_punct: bool) -> list[tuple[str, int, int]]:
    """Character-at-a-time scanner — the slow, obviously-correct oracle."""
    out: list[tuple[str, int, int]] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if _is_ws(ch):
            i += 1
            continue
        if _is_bert_punct(ch):
            out.append((ch, i, i + 1))
            i += 1
            continue
        start = i
        while i < n and not _is_ws(text[i]) and not _is_bert_punct(text[i]):
            i += 1
        out.append((text[start:i], start, i))
    return [
        (tok, s, e)
        for tok, s, e in out
        if not _is_special_token(tok)
        and (not remove_punct or any(c.isalnum() for c in tok))
    ]


texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=300, deadline=None)
@given(text=texts, remove_punct=st.booleans())
# U+11F43 KAWI DANDA: punct in Unicode >= 15 (regex module, HF), Cn in
# CPython 3.11's unicodedata (14.0). Pinned after the skew was found —
# the oracle must classify from the regex tables for this to pass.
@example(text="0\U00011f43", remove_punct=False)
@example(text="0\U00011f43", remove_punct=True)
def test_matches_naive_oracle(text: str, remove_punct: bool):
    assert plain_word_records(text, remove_punct) == naive_records(
        text, remove_punct
    )


@settings(max_examples=300, deadline=None)
@given(text=texts, remove_punct=st.booleans())
@example(text="0\U00011f43", remove_punct=False)
def test_offset_invariants(text: str, remove_punct: bool):
    prev_end = 0
    for token, start, end in plain_word_records(text, remove_punct):
        # offsets re-slice the source text (char indices)
        assert text[start:end] == token
        # monotone, non-overlapping, non-empty spans
        assert start >= prev_end and end > start
        prev_end = end


@settings(max_examples=200, deadline=None)
@given(text=texts)
@example(text="0\U00011f43")
def test_remove_punct_is_a_filter(text: str):
    """remove_punct=True output is exactly the punct-kept output minus
    no-alnum tokens — never different tokens or offsets."""
    kept = plain_word_records(text, False)
    filtered = plain_word_records(text, True)
    assert filtered == [
        r for r in kept if any(c.isalnum() for c in r[0])
    ]
