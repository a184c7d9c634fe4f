"""Optional-dependency integration tests — the reference's gated tier
(SURVEY.md §5.3: HF/Lindera/Jieba tests are opt-in and assert
linguistic *properties*, not exact tokens). These skip cleanly when
the backing package is absent (as in this container) and run for real
when it is installed, keeping the backends honest in richer
environments.
"""

from __future__ import annotations

import importlib.util

import pytest

from polars_text_spark.functions.tokenize import load_backend

needs_tokenizers = pytest.mark.skipif(
    importlib.util.find_spec("tokenizers") is None,
    reason="requires the 'tokenizers' package",
)
needs_jieba = pytest.mark.skipif(
    importlib.util.find_spec("jieba") is None, reason="requires jieba"
)


@needs_tokenizers
def test_huggingface_backend_subwords():  # pragma: no cover - gated
    backend = load_backend("huggingface:bert-base-uncased")
    out = backend.tokenize("Tokenization happens fast", True, True)
    tokens = [t["token"] for t in out]
    # WordPiece subwords keep their ## prefix; offsets reconstruct the
    # raw (lowercased) substring (reference
    # tests/test_tokenize_with_offsets.py:64-78).
    assert any(t.startswith("##") for t in tokens)
    text = "tokenization happens fast"
    for t in out:
        assert text[t["start"] : t["end"]] == t["token"].removeprefix("##")


@needs_jieba
def test_jieba_backend_properties():  # pragma: no cover - gated
    backend = load_backend("lindera:jieba")
    out = backend.tokenize("他来到了北京清华大学", False, True)
    tokens = [t["token"] for t in out]
    # Word-level segmentation: at least one multi-char token, fewer
    # tokens than characters (reference tests/test_jieba_chinese.py:41-69).
    assert any(len(t) > 1 for t in tokens)
    assert len(tokens) < len("他来到了北京清华大学")
    # char offsets reconstruct the source
    for t in out:
        assert "他来到了北京清华大学"[t["start"] : t["end"]] == t["token"]


def test_gates_report_skip_reason_cleanly():
    """In this container both backends are absent: loading raises the
    documented RuntimeError rather than an ImportError traceback."""
    if importlib.util.find_spec("jieba") is None:
        with pytest.raises(RuntimeError, match="jieba"):
            load_backend("lindera:jieba")
    if importlib.util.find_spec("tokenizers") is None:
        with pytest.raises(RuntimeError, match="tokenizers"):
            load_backend("huggingface:bert-base-uncased")
