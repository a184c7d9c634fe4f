"""Token-budgeted document chunking (pure Python, runs inside a pandas
UDF executor-side).

Reimplements the documented strategy of
/root/reference/src/topic_modeling/chunking.rs: split paragraphs
first (:291-312), split oversized paragraphs into sentences using the
sentence_count terminator set (:314-339), split oversized sentences by
whitespace-word packing with per-char packing as the last resort
(:175-236), then greedily pack units to ``max_tokens`` carrying an
overlap suffix across seams (:238-281). Empty/whitespace docs yield
zero chunks (:105-107); any other doc yields >= 1 chunk.

Token counting: the reference sizes chunks with the embedder's own
tokenizer, truncation disabled (:341-346). ONNX tokenizers are not
available here, so the default counter is whitespace word count — a
documented deviation that preserves every structural property
(budgeted packing, overlap semantics, fallback ladder). A different
counter can be injected for parity with a real tokenizer.
"""

from __future__ import annotations

from typing import Callable

__all__ = [
    "chunk_document",
    "chunk_rows",
    "split_paragraphs",
    "split_sentences",
]

_TERMINATORS = set(".!?。！？۔؟।॥")


def _default_count(text: str) -> int:
    return len(text.split())


def split_paragraphs(text: str) -> list[str]:
    """Blank-line-separated paragraphs; intra-paragraph lines joined
    with newline, edges trimmed (chunking.rs:291-312)."""
    paragraphs: list[str] = []
    current: list[str] = []
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped:
            if current:
                paragraphs.append("\n".join(current))
                current = []
            continue
        current.append(stripped)
    if current:
        paragraphs.append("\n".join(current))
    return paragraphs


def split_sentences(text: str) -> list[str]:
    """Split after each terminator, keeping the terminator; drop
    whitespace-only segments (chunking.rs:314-339)."""
    sentences: list[str] = []
    start = 0
    for idx, ch in enumerate(text):
        if ch in _TERMINATORS:
            segment = text[start : idx + 1].strip()
            if segment:
                sentences.append(segment)
            start = idx + 1
    trailing = text[start:].strip()
    if trailing:
        sentences.append(trailing)
    return sentences


def _append_packed_segments(
    segments: list[str],
    separator: str,
    max_tokens: int,
    count: Callable[[str], int],
    out: list[tuple[str, int]],
) -> None:
    """Greedy left-to-right packing of segments into <= max_tokens
    units; an oversize single segment still becomes a unit
    (chunking.rs:204-236)."""
    current = ""
    for segment in segments:
        candidate = segment if not current else f"{current}{separator}{segment}"
        if count(candidate) <= max_tokens or not current:
            current = candidate
            continue
        out.append((current, count(current)))
        current = segment
    if current.strip():
        out.append((current, count(current)))


def _append_length_units(
    text: str,
    max_tokens: int,
    count: Callable[[str], int],
    out: list[tuple[str, int]],
) -> None:
    """Word packing; recurse on still-oversized word units; single-word
    texts fall back to per-character packing (chunking.rs:175-202)."""
    words = text.split()
    if len(words) > 1:
        word_units: list[tuple[str, int]] = []
        _append_packed_segments(words, " ", max_tokens, count, word_units)
        for unit_text, unit_tokens in word_units:
            if unit_tokens <= max_tokens:
                out.append((unit_text, unit_tokens))
            else:
                _append_length_units(unit_text, max_tokens, count, out)
    else:
        _append_packed_segments(list(text), "", max_tokens, count, out)


def _append_sized_units(
    text: str,
    max_tokens: int,
    count: Callable[[str], int],
    out: list[tuple[str, int]],
) -> None:
    trimmed = text.strip()
    if not trimmed:
        return
    tokens = count(trimmed)
    if tokens <= max_tokens:
        out.append((trimmed, tokens))
        return
    sentences = split_sentences(trimmed)
    if len(sentences) > 1:
        for sentence in sentences:
            s_tokens = count(sentence)
            if s_tokens <= max_tokens:
                out.append((sentence, s_tokens))
            else:
                _append_length_units(sentence, max_tokens, count, out)
    else:
        _append_length_units(trimmed, max_tokens, count, out)


def _overlap_suffix(
    units: list[tuple[str, int]], overlap: int, max_tokens: int
) -> list[tuple[str, int]]:
    """Trailing units to carry into the next chunk (chunking.rs:266-281):
    walk backwards until >= overlap tokens, never reaching max_tokens."""
    if overlap == 0:
        return []
    selected: list[tuple[str, int]] = []
    tokens = 0
    for unit in reversed(units):
        if tokens + unit[1] >= max_tokens:
            break
        selected.append(unit)
        tokens += unit[1]
        if tokens >= overlap:
            break
    selected.reverse()
    return selected


def _pack_units(
    units: list[tuple[str, int]], max_tokens: int, overlap: int
) -> list[str]:
    overlap = min(overlap, max(max_tokens - 1, 0))
    chunks: list[str] = []
    current: list[tuple[str, int]] = []
    current_tokens = 0
    for unit in units:
        if current and current_tokens + unit[1] > max_tokens:
            chunks.append(" ".join(u[0] for u in current))
            current = _overlap_suffix(current, overlap, max_tokens)
            current_tokens = sum(u[1] for u in current)
            # Shed overlap from the front until the new unit fits
            # (chunking.rs:252-257).
            while current and current_tokens + unit[1] > max_tokens:
                current_tokens -= current.pop(0)[1]
        current_tokens += unit[1]
        current.append(unit)
    if current:
        chunks.append(" ".join(u[0] for u in current))
    return chunks


def chunk_document(
    doc: str | None,
    *,
    max_tokens: int = 256,
    overlap: int = 32,
    count: Callable[[str], int] | None = None,
) -> list[str]:
    """All chunks of one document, in order. Empty/None -> []."""
    if max_tokens <= 0:
        raise ValueError("chunking max_tokens must be > 0")
    if doc is None or not doc.strip():
        return []
    counter = count or _default_count
    units: list[tuple[str, int]] = []
    for paragraph in split_paragraphs(doc):
        _append_sized_units(paragraph, max_tokens, counter, units)
    return _pack_units(units, max_tokens, overlap)


def chunk_rows(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_tokens: int = 256,
    overlap: int = 32,
):
    """Distributed chunking surface: one row per chunk,
    ``(id_col, chunk_index, chunk, n_tokens)`` with ``chunk_index``
    contiguous from 0 per document and ``n_tokens`` the SAME counter
    the packer budgeted with (so ``n_tokens <= max_tokens`` holds by
    construction). Empty/whitespace docs contribute zero rows.

    Runs :func:`chunk_document` inside an Arrow-batched pandas UDF —
    per-doc Python work over string batches, no driver collect; the
    explode is the only row multiplier (bounded by
    ``doc_tokens / max_tokens`` chunks per doc, + overlap carry).
    """
    import pandas as pd  # noqa: F401  (pandas ships with pyspark env)
    from typing import Iterator

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    counter = _default_count
    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("chunk", T.StringType(), False),
                T.StructField("n_tokens", T.IntegerType(), False),
            ]
        ),
        containsNull=False,
    )

    def fn(batches):
        for series in batches:
            yield series.map(
                lambda t: [
                    {"chunk": c, "n_tokens": counter(c)}
                    for c in chunk_document(
                        t, max_tokens=max_tokens, overlap=overlap
                    )
                ]
            )

    # explicit annotations: `from __future__ import annotations` turns
    # inline hints into strings pandas_udf can't infer from
    fn.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    udf = F.pandas_udf(fn, out_type)
    # posexplode_outer + null filter (not posexplode): the
    # InferFiltersFromGenerate trap would re-inline the UDF into a
    # pre-generate filter and run the chunker twice per row
    exploded = df.select(
        F.col(id_col), F.posexplode_outer(udf(F.col(text_col)))
    ).filter(F.col("col").isNotNull())
    return exploded.select(
        id_col,
        F.col("pos").cast("int").alias("chunk_index"),
        F.col("col.chunk").alias("chunk"),
        F.col("col.n_tokens").cast("int").alias("n_tokens"),
    )
