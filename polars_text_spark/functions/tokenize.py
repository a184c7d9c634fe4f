"""Tokenization with per-token character offsets.

Re-expresses the reference's pluggable tokenizer
(/root/reference/src/tokenizer.rs, src/expressions.rs:754-851) as an
Arrow-batched pandas UDF returning
``array<struct<token:string, start:long, end:long>>``.

Backend dispatch is exact-match on the model-id prefix
(src/tokenizer.rs:243-289); unprefixed ids are rejected
(src/tokenizer.rs:430-437). Backends live in an executor-local
registry (module dict + lock ≙ the reference's
``RwLock<HashMap<...>>``, src/tokenizer.rs:211-241); Python workers
are reused so a model loads once per executor worker, not per task.

The native backend replicates HF ``BertPreTokenizer`` splitting in
pure Python: split on Unicode whitespace, isolate each punctuation
character (Unicode category P* or ASCII punctuation) as its own
token (src/tokenizer.rs:62-93). ``remove_punct`` keeps a token iff it
contains an alphanumeric char (src/tokenizer.rs:32-34); special
tokens [CLS]/[SEP]/[PAD]/[UNK]/[MASK] — bracketed or bare,
case-insensitive — are dropped (src/tokenizer.rs:30,52-60).

Offsets are **character** offsets into the (lowercased, when
``lowercase=True``) text; Python string indices are already
char-based, so the reference's byte->char sweep (src/offsets.rs:21-51)
is unnecessary here. Invariants (tests/test_tokenize_with_offsets.py):
``text[start:end] == token`` for native tokens, spans monotone
non-overlapping. Null/empty input -> empty list, never null
(src/expressions.rs:834-840).
"""

from __future__ import annotations

import threading
from typing import Callable, Iterator

import pandas as pd
import regex as _regex
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_text_spark.models import normalise_model

__all__ = [
    "TOKEN_SCHEMA",
    "load_backend",
    "loaded_models",
    "tokenize",
    "tokenize_plain_text",
    "plain_word_records",
]

TOKEN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("token", T.StringType(), False),
            T.StructField("start", T.LongType(), False),
            T.StructField("end", T.LongType(), False),
        ]
    ),
    containsNull=False,
)

_SPECIAL_TOKENS = frozenset({"[CLS]", "[SEP]", "[PAD]", "[UNK]", "[MASK]"})

# BERT punctuation = Unicode P* OR ASCII punctuation. The ASCII chars
# not already in \p{P} are the symbol set $ + < = > ^ ` | ~
# (categories Sc/Sm/Sk — the backtick is Sk, easy to miss).
_BERT_PUNCT_CLASS = r"\p{P}$+<=>^`|~"
# One scan: a "word" is a maximal run of non-space non-punct chars; a
# punctuation char is its own single-char token.
_TOKEN_RE = _regex.compile(rf"[^\s{_BERT_PUNCT_CLASS}]+|[{_BERT_PUNCT_CLASS}]")


def _is_special_token(token: str) -> bool:
    upper = token.upper()
    return upper in _SPECIAL_TOKENS or f"[{upper}]" in _SPECIAL_TOKENS


def _keep_token(token: str, remove_punct: bool) -> bool:
    if remove_punct and not any(ch.isalnum() for ch in token):
        return False
    return bool(token) and not _is_special_token(token)


def plain_word_records(
    text: str, remove_punct: bool
) -> list[tuple[str, int, int]]:
    """BertPreTokenizer-equivalent records (src/tokenizer.rs:62-93)."""
    return [
        (m.group(), m.start(), m.end())
        for m in _TOKEN_RE.finditer(text)
        if _keep_token(m.group(), remove_punct)
    ]


def tokenize_plain_text(text: str, lowercase: bool, remove_punct: bool) -> list[str]:
    """Token strings only — used by concordance context windows
    (src/concordance.rs:101-102)."""
    if lowercase:
        text = text.lower()
    return [tok for tok, _, _ in plain_word_records(text, remove_punct)]


class _Backend:
    """A loaded tokenizer. ``case_aware`` mirrors src/tokenizer.rs:95-117:
    caseless scripts skip the lowercase fold entirely."""

    case_aware = True

    def records(self, text: str, remove_punct: bool) -> list[tuple[str, int, int]]:
        raise NotImplementedError

    def tokenize(
        self, text: str | None, lowercase: bool, remove_punct: bool
    ) -> list[dict]:
        if text is None or text == "":
            return []
        if lowercase and self.case_aware:
            text = text.lower()
        return [
            {"token": tok, "start": start, "end": end}
            for tok, start, end in self.records(text, remove_punct)
        ]

    def flat_records(
        self, text: str | None, lowercase: bool, remove_punct: bool
    ) -> tuple[list[str], list[int], list[int]]:
        """Three parallel flat columns — the Arrow-friendly shape (the
        reference builds ONE flat struct for all rows and slices spans,
        src/expressions.rs:503-553; here the flat arrays cross the
        JVM<->Python boundary as primitive Arrow arrays and arrays_zip
        assembles structs JVM-side)."""
        if text is None or text == "":
            return [], [], []
        if lowercase and self.case_aware:
            text = text.lower()
        recs = self.records(text, remove_punct)
        return (
            [r[0] for r in recs],
            [r[1] for r in recs],
            [r[2] for r in recs],
        )


class _PlainWordsEn(_Backend):
    def records(self, text: str, remove_punct: bool):
        return plain_word_records(text, remove_punct)


class _HuggingFace(_Backend):
    """Full HF tokenizer from tokenizer.json (src/tokenizer.rs:145-161,
    291-306): encode without special tokens; subwords keep their ``##``
    prefix while offsets index the raw substring."""

    def __init__(self, repo: str) -> None:
        try:
            from tokenizers import Tokenizer
        except ImportError as exc:  # pragma: no cover - optional dep
            raise RuntimeError(
                f"huggingface:{repo} requires the 'tokenizers' package"
            ) from exc
        self._tokenizer = Tokenizer.from_pretrained(repo)

    def records(self, text: str, remove_punct: bool):
        encoding = self._tokenizer.encode(text, add_special_tokens=False)
        out = []
        for token, (start, end) in zip(encoding.tokens, encoding.offsets):
            if _keep_token(token, remove_punct):
                out.append((token, start, end))
        return out


def _sweep_surface_offsets(
    text: str, surfaces: list[str]
) -> list[tuple[str, int, int]]:
    """Char offsets for an in-order surface sequence via one
    left-to-right cursor sweep — the char-domain analog of the
    reference's byte->char offset sweep (src/offsets.rs:21-51).
    Morpheme analyzers emit surfaces in input order but may drop
    whitespace between them, so each surface is located with
    ``find(surface, cursor)``; a surface the analyzer normalized away
    from the raw text (rare) is skipped rather than guessed, keeping
    the ``text[start:end] == token`` invariant unconditional."""
    out: list[tuple[str, int, int]] = []
    cursor = 0
    for surface in surfaces:
        if not surface:
            continue
        idx = text.find(surface, cursor)
        if idx < 0:
            continue
        out.append((surface, idx, idx + len(surface)))
        cursor = idx + len(surface)
    return out


class _JapaneseMorpheme(_Backend):
    """Japanese morphological segmentation for the ``lindera:ja-ipadic``
    / ``lindera:ja-ipadic-neologd`` / ``lindera:ja-unidic`` ids
    (src/tokenizer.rs:162-185, dict protocol src/lindera_dict.rs:29-86)
    via fugashi (MeCab) when importable, else SudachiPy. Equivalent
    *capability* (morpheme-level ja segmentation with char offsets),
    not byte-identical to lindera's dictionaries — the same documented
    deviation as :class:`_Jieba`. The three ja dict ids bind whatever
    dictionary the installed analyzer ships (ipadic / unidic-lite /
    sudachi core), mirroring the id surface, not the dictionary build.
    The reference's versioned dict download/cache/lock protocol itself
    IS implemented (:mod:`polars_text_spark.functions.dict_cache`,
    ``prefetch_dictionary``) — what remains gated is binding a
    downloaded Lindera dict build into an installed analyzer.
    """

    case_aware = False

    def __init__(self, model_id: str) -> None:
        try:
            from fugashi import Tagger

            self._impl = ("fugashi", Tagger())
            return
        except ImportError:
            pass
        try:
            from sudachipy import dictionary
            from sudachipy import tokenizer as sudachi_tokenizer

            self._impl = (
                "sudachi",
                (
                    dictionary.Dictionary().create(),
                    sudachi_tokenizer.Tokenizer.SplitMode.C,
                ),
            )
        except ImportError as exc:  # pragma: no cover - optional dep
            raise RuntimeError(
                f"{model_id} needs a Japanese morpheme segmenter "
                "(fugashi or sudachipy) which is not installed"
            ) from exc

    def records(self, text: str, remove_punct: bool):
        kind, impl = self._impl
        if kind == "fugashi":
            recs = _sweep_surface_offsets(
                text, [word.surface for word in impl(text)]
            )
        else:
            obj, mode = impl
            # SudachiPy morphemes carry char begin/end directly
            recs = [
                (m.surface(), m.begin(), m.end())
                for m in obj.tokenize(text, mode)
            ]
        return [
            r
            for r in recs
            if r[0].strip() and _keep_token(r[0], remove_punct)
        ]


class _KoreanMorpheme(_Backend):
    """Korean morpheme segmentation for the ``lindera:ko-dic`` id
    (src/tokenizer.rs:162-185) via python-mecab-ko. Same
    capability-parity stance as :class:`_JapaneseMorpheme`; offsets
    come from the shared cursor sweep (mecab-ko emits surfaces in
    input order without positions)."""

    case_aware = False

    def __init__(self) -> None:
        try:
            import mecab
        except ImportError as exc:  # pragma: no cover - optional dep
            raise RuntimeError(
                "lindera:ko-dic needs a Korean morpheme segmenter "
                "(python-mecab-ko) which is not installed"
            ) from exc
        self._mecab = mecab.MeCab()

    def records(self, text: str, remove_punct: bool):
        recs = _sweep_surface_offsets(text, self._mecab.morphs(text))
        return [
            r
            for r in recs
            if r[0].strip() and _keep_token(r[0], remove_punct)
        ]


class _Jieba(_Backend):
    """CJK word segmentation for the ``lindera:jieba`` /
    ``lindera:cc-cedict`` ids. Equivalent *capability* (word-level zh
    segmentation with char offsets), not byte-identical tokens — a
    documented deviation (SURVEY.md §2.1 backend table)."""

    case_aware = False

    def __init__(self) -> None:
        try:
            import jieba
        except ImportError as exc:  # pragma: no cover - optional dep
            raise RuntimeError(
                "lindera:jieba / lindera:cc-cedict require the 'jieba' package"
            ) from exc
        self._jieba = jieba
        jieba.initialize()

    def records(self, text: str, remove_punct: bool):
        out = []
        for token, start, end in self._jieba.tokenize(text):
            if not token.strip():
                continue
            if _keep_token(token, remove_punct):
                out.append((token, start, end))
        return out


_REGISTRY: dict[str, _Backend] = {}
_REGISTRY_LOCK = threading.Lock()


def _build_backend(model_id: str) -> _Backend:
    if model_id == "native:plain_words_en":
        return _PlainWordsEn()
    if model_id.startswith("huggingface:"):
        return _HuggingFace(model_id.split(":", 1)[1])
    if model_id in ("lindera:jieba", "lindera:cc-cedict"):
        return _Jieba()
    if model_id in (
        "lindera:ja-ipadic",
        "lindera:ja-ipadic-neologd",
        "lindera:ja-unidic",
    ):
        return _JapaneseMorpheme(model_id)
    if model_id == "lindera:ko-dic":
        return _KoreanMorpheme()
    if model_id.startswith("lindera:"):
        raise RuntimeError(
            f"{model_id} needs a CJK morpheme segmenter (fugashi/mecab-ko) "
            "which is not installed"
        )
    raise ValueError(
        f"unknown tokenizer model id '{model_id}'; expected a "
        "'native:'/'huggingface:'/'lindera:' prefixed id"
    )


def load_backend(model_id: str) -> _Backend:
    """Double-checked-locked registry load (src/tokenizer.rs:211-241)."""
    backend = _REGISTRY.get(model_id)
    if backend is not None:
        return backend
    with _REGISTRY_LOCK:
        backend = _REGISTRY.get(model_id)
        if backend is None:
            backend = _build_backend(model_id)
            _REGISTRY[model_id] = backend
        return backend


def loaded_models() -> list[str]:
    return list(_REGISTRY)


def _tokenize_fn(
    model_id: str, lowercase: bool, remove_punct: bool
) -> Callable[[Iterator[pd.Series]], Iterator[pd.Series]]:
    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        backend = load_backend(model_id)  # once per worker, reused across batches
        for series in batches:
            yield series.map(
                lambda text: backend.tokenize(text, lowercase, remove_punct)
            )

    return fn


_FLAT_TOKEN_TYPE = T.StructType(
    [
        T.StructField("tok", T.ArrayType(T.StringType(), False), False),
        T.StructField("s", T.ArrayType(T.LongType(), False), False),
        T.StructField("e", T.ArrayType(T.LongType(), False), False),
    ]
)


def _tokenize_flat_fn(
    model_id: str, lowercase: bool, remove_punct: bool
) -> Callable[[Iterator[pd.Series]], Iterator[pd.DataFrame]]:
    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        backend = load_backend(model_id)
        for series in batches:
            toks: list[list[str]] = []
            starts: list[list[int]] = []
            ends: list[list[int]] = []
            for text in series:
                t, s, e = backend.flat_records(text, lowercase, remove_punct)
                toks.append(t)
                starts.append(s)
                ends.append(e)
            yield pd.DataFrame({"tok": toks, "s": starts, "e": ends})

    return fn


def tokenize(
    col: Column | str,
    *,
    model: str,
    lowercase: bool = True,
    remove_punct: bool = True,
) -> Column:
    """Tokenize a string column into ``{token, start, end}`` structs.

    Deterministic elementwise pandas UDF — Catalyst pushes filters and
    limits past it, exactly the behavior the reference's
    ``is_elementwise=True`` buys (tests/test_tokenize_cache.py:65-111).
    For content-addressed caching use
    :func:`polars_text_spark.operators.cache.tokenize_cached`.

    The UDF emits three flat primitive arrays (cheap Arrow transfer,
    ~25% faster than per-token dicts at sf0.1) and ``arrays_zip``
    assembles the structs JVM-side — the output type is identical.
    """
    model_id = normalise_model(model)
    # Validate the id shape eagerly, before any job runs (the reference
    # raises at plan-build time too) — but don't *load* heavy backends
    # on the driver.
    if not model_id.split(":", 1)[0] in ("native", "huggingface", "lindera"):
        raise ValueError(
            f"unknown tokenizer model id '{model_id}'; expected a "
            "'native:'/'huggingface:'/'lindera:' prefixed id"
        )
    udf = F.pandas_udf(
        _tokenize_flat_fn(model_id, lowercase, remove_punct), _FLAT_TOKEN_TYPE
    )
    c = F.col(col) if isinstance(col, str) else col
    flat = udf(c)
    return F.arrays_zip(
        flat["tok"].alias("token"),
        flat["s"].alias("start"),
        flat["e"].alias("end"),
    ).alias("tokens")
