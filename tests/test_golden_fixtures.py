"""Recorded-fixture fidelity tests for the import-gated backends
(VERDICT r8 item 3): the committed golden outputs in
tests/fixtures/golden_backends.json pin EXACT tokens+offsets (and the
MiniLM vector, once regenerated in a dep-rich environment) so backend
fidelity is asserted the moment the dependency becomes importable —
no container upgrade needed to keep the expectation.

Two tiers:

- self-consistency (runs EVERYWHERE, no deps): every fixture entry's
  offsets must reconstruct its own text (``text[start:end] == token``
  modulo the WordPiece ``##`` prefix and the lowercase fold), spans
  must be in order, and the fixture must parse — a bad hand edit
  fails CI immediately, not in some future environment;
- live replay (skip-if-absent): when the backing package imports, the
  real backend must reproduce the committed sequence byte-for-byte.
  Reference behavior pinned: subword ``##`` prefixes with
  raw-substring offsets (/root/reference/src/tokenizer.rs:145-161,
  tests/test_tokenize_with_offsets.py:64-78) and mean-pool + L2 for
  the embedder (embedding.rs:189-250).
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "golden_backends.json"
)

with open(FIXTURE, encoding="utf-8") as _fh:
    GOLDEN = json.load(_fh)

_DEP = {
    "huggingface": "tokenizers",
    "lindera:jieba": "jieba",
    "lindera:cc-cedict": "jieba",
    "lindera:ja-ipadic": "fugashi|sudachipy",
    "lindera:ja-ipadic-neologd": "fugashi|sudachipy",
    "lindera:ja-unidic": "fugashi|sudachipy",
    "lindera:ko-dic": "mecab",
}


def _dep_for(model_id: str) -> str:
    # a fixture entry may restrict its live replay to the specific
    # analyzer its hand derivation was made for (e.g. fugashi, not the
    # sudachi fallback whose dictionary segments differently — a
    # documented capability-parity deviation, not a regression)
    entry = GOLDEN["tokenizers"].get(model_id, {})
    if "dep" in entry:
        return entry["dep"]
    if model_id.startswith("huggingface:"):
        return _DEP["huggingface"]
    return _DEP[model_id]


def _importable(spec: str) -> bool:
    return any(importlib.util.find_spec(m) is not None for m in spec.split("|"))


# ---- tier 1: fixture self-consistency (no deps needed) -------------------


@pytest.mark.parametrize("model_id", sorted(GOLDEN["tokenizers"]))
def test_fixture_offsets_reconstruct_text(model_id):
    entry = GOLDEN["tokenizers"][model_id]
    text = entry["text"].lower() if entry["lowercase"] else entry["text"]
    last_end = 0
    assert entry["tokens"], model_id
    for token, start, end in entry["tokens"]:
        assert 0 <= start < end <= len(text), (model_id, token)
        assert start >= last_end or token.startswith("##"), (
            "spans out of order",
            model_id,
            token,
        )
        surface = text[start:end]
        assert surface == token.removeprefix("##"), (model_id, token, surface)
        last_end = end


def test_fixture_has_the_reference_pinned_shapes():
    """The hand-derived entries must keep the shapes the reference
    semantics demand: a WordPiece split with ## prefix for the HF id,
    a multi-char CJK word for jieba, contiguous whole-text morpheme
    covers for the ja/ko analyzers (their example sentences carry no
    whitespace or punctuation, so the morphemes must tile the text
    exactly)."""
    hf = GOLDEN["tokenizers"]["huggingface:bert-base-uncased"]
    assert any(t[0].startswith("##") for t in hf["tokens"])
    zh = GOLDEN["tokenizers"]["lindera:jieba"]
    assert any(len(t[0]) > 1 for t in zh["tokens"])
    assert len(zh["tokens"]) < len(zh["text"])
    for mid in ("lindera:ja-ipadic", "lindera:ko-dic"):
        entry = GOLDEN["tokenizers"][mid]
        assert "".join(t[0] for t in entry["tokens"]) == entry["text"], mid
        assert any(len(t[0]) > 1 for t in entry["tokens"]), mid


def test_embedder_fixture_structural_contract():
    """The MiniLM entry pins the reference's output contract (dim 384,
    mean-pool + L2 unit norm — embedding.rs:189-250) even before a
    dep-rich environment fills the value vector; once filled, the
    vector must honor its own declared contract."""
    entry = GOLDEN["embedders"]["onnx-community/all-MiniLM-L6-v2-ONNX"]
    assert entry["dim"] == 384 and entry["unit_norm"] is True
    assert entry["text"]
    if entry["vector"] is not None:
        import math

        assert len(entry["vector"]) == entry["dim"]
        norm = math.sqrt(sum(x * x for x in entry["vector"]))
        assert abs(norm - 1.0) < 1e-3


# ---- tier 2: live replay (skip when the dep is absent) -------------------


@pytest.mark.parametrize("model_id", sorted(GOLDEN["tokenizers"]))
def test_gated_backend_reproduces_golden_tokens(model_id):  # pragma: no cover
    if not _importable(_dep_for(model_id)):
        pytest.skip(f"requires {_dep_for(model_id)}")
    from polars_text_spark.functions.tokenize import load_backend

    entry = GOLDEN["tokenizers"][model_id]
    out = load_backend(model_id).tokenize(
        entry["text"], entry["lowercase"], entry["remove_punct"]
    )
    got = [[t["token"], t["start"], t["end"]] for t in out]
    assert got == entry["tokens"]


@pytest.mark.parametrize("model_id", sorted(GOLDEN["embedders"]))
def test_gated_embedder_reproduces_golden_vector(model_id):  # pragma: no cover
    if not (_importable("onnxruntime") and _importable("tokenizers")):
        pytest.skip("requires onnxruntime + tokenizers")
    import numpy as np

    from polars_text_spark.functions.embedding import load_embedder

    entry = GOLDEN["embedders"][model_id]
    vec = load_embedder(model_id).embed_batch([entry["text"]])[0]
    arr = np.asarray(vec, dtype=np.float64)
    assert arr.shape == (entry["dim"],)
    if entry.get("unit_norm"):
        assert abs(float(np.linalg.norm(arr)) - 1.0) < 1e-3
    if entry["vector"] is None:
        # structural-contract entry: values not yet regenerated in a
        # dep-rich environment — pin determinism instead, and remind
        # the runner to fill the fixture
        again = np.asarray(
            load_embedder(model_id).embed_batch([entry["text"]])[0]
        )
        assert np.array_equal(arr, again)
        pytest.skip(
            "vector pending regeneration: run "
            "scripts/regen_golden_fixtures.py here to pin exact values"
        )
    assert np.allclose(arr, np.array(entry["vector"]), atol=1e-4)
