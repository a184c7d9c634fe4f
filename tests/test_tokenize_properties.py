"""Property-based tests for the plain-words tokenizer.

Mirrors the reference's property-test strategy (SURVEY.md §5.1): the
fast implementation is checked against a deliberately-naive oracle
(src/offsets.rs:57-165 keeps "the property-test oracle" in-tree), plus
structural invariants over arbitrary unicode text. Pure Python — no
SparkSession, so hypothesis can run hundreds of cases cheaply.
"""

from __future__ import annotations

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from polars_text_spark.functions.tokenize import (
    _is_special_token,
    plain_word_records,
)


def _is_bert_punct(ch: str) -> bool:
    # HF BertPreTokenizer punctuation: ASCII punctuation OR Unicode P*.
    if ch in r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""":
        return True
    return unicodedata.category(ch).startswith("P")


def _is_ws(ch: str) -> bool:
    # Unicode White_Space — what Rust char::is_whitespace and regex \s
    # use. Python str.isspace() is broader: it also counts \x1c-\x1f
    # (bidi separators, NOT White_Space), which would diverge from the
    # reference's splitting. Found by hypothesis.
    return ch.isspace() and ch not in "\x1c\x1d\x1e\x1f"


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
def test_matches_naive_oracle(text: str, remove_punct: bool):
    assert plain_word_records(text, remove_punct) == naive_records(
        text, remove_punct
    )


@settings(max_examples=300, deadline=None)
@given(text=texts, remove_punct=st.booleans())
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
def test_remove_punct_is_a_filter(text: str):
    """remove_punct=True output is exactly the punct-kept output minus
    no-alnum tokens — never different tokens or offsets."""
    kept = plain_word_records(text, False)
    filtered = plain_word_records(text, True)
    assert filtered == [
        r for r in kept if any(c.isalnum() for c in r[0])
    ]
