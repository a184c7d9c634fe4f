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


needs_onnx = pytest.mark.skipif(
    importlib.util.find_spec("onnxruntime") is None
    or importlib.util.find_spec("tokenizers") is None,
    reason="requires onnxruntime + tokenizers",
)


def test_mean_pool_normalize_matches_hand_computation():
    """Golden test ported from the reference
    (src/topic_modeling/embedding.rs:445-456): batch=1, seq=2, dim=2,
    second token masked out -> first token's vector, L2-normalized."""
    import numpy as np

    from polars_text_spark.functions.embedding import mean_pool_normalize

    hidden = np.array([[[3.0, 4.0], [100.0, 100.0]]], dtype=np.float32)
    mask = np.array([[1, 0]], dtype=np.int64)
    row = mean_pool_normalize(hidden, mask)[0]
    assert abs(row[0] - 0.6) < 1e-5 and abs(row[1] - 0.8) < 1e-5


def test_embeddings_from_2d_output_normalizes_rows():
    """embedding.rs:458-463: [batch, dim] output is row-normalized."""
    import numpy as np

    from polars_text_spark.functions.embedding import embeddings_from_output

    out = embeddings_from_output(
        np.array([[3.0, 4.0]], dtype=np.float32), 1, np.array([[1]])
    )
    assert abs(out[0][0] - 0.6) < 1e-5 and abs(out[0][1] - 0.8) < 1e-5


def test_mean_pool_zero_mask_row_stays_zero():
    """A fully-masked row pools to the zero vector and L2-normalize
    leaves it zero (embedding.rs denom guard + norm>0 guard)."""
    import numpy as np

    from polars_text_spark.functions.embedding import mean_pool_normalize

    hidden = np.ones((1, 3, 4), dtype=np.float32)
    mask = np.zeros((1, 3), dtype=np.int64)
    assert np.all(mean_pool_normalize(hidden, mask) == 0.0)


def test_onnx_embedder_error_path_without_deps():
    """Without onnxruntime the plan-time gate raises the documented
    RuntimeError (not an ImportError traceback), and building the
    executor-side embedder does too."""
    if importlib.util.find_spec("onnxruntime") is not None:
        pytest.skip("onnxruntime installed; error path not reachable")
    from polars_text_spark.functions.embedding import (
        _OnnxEmbedder,
        embedding,
    )

    with pytest.raises(RuntimeError, match="onnxruntime"):
        embedding("text")  # default = ONNX model id
    with pytest.raises(RuntimeError, match="onnxruntime"):
        _OnnxEmbedder("onnx-community/all-MiniLM-L6-v2-ONNX")


@needs_onnx
def test_onnx_embedder_real_inference():  # pragma: no cover - gated
    """When the deps exist, the real path must produce unit-norm
    vectors of the advertised dimensionality, deterministically."""
    import numpy as np

    from polars_text_spark.functions.embedding import (
        DEFAULT_EMBEDDER_MODEL,
        load_embedder,
    )

    try:
        emb = load_embedder(DEFAULT_EMBEDDER_MODEL)
    except RuntimeError as exc:
        pytest.skip(f"model artifacts unavailable: {exc}")
    a = emb.embed_batch(["hello world", "completely different text"])
    b = emb.embed_batch(["hello world", "completely different text"])
    assert a.shape[1] > 0 and np.allclose(a, b)
    norms = np.linalg.norm(a, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-4)


def test_gates_report_skip_reason_cleanly():
    """In this container both backends are absent: loading raises the
    documented RuntimeError rather than an ImportError traceback."""
    if importlib.util.find_spec("jieba") is None:
        with pytest.raises(RuntimeError, match="jieba"):
            load_backend("lindera:jieba")
    if importlib.util.find_spec("tokenizers") is None:
        with pytest.raises(RuntimeError, match="tokenizers"):
            load_backend("huggingface:bert-base-uncased")


# ---- pacmap / hdbscan fall-throughs (topic modeling) ----------------------
#
# reduce.py and cluster.py import-and-use the real libraries when
# present; these tests mirror the reference's own unit tests
# (reduce.rs:109-135 approximate seeded reproducibility;
# cluster.rs:96-141 blob separation) so the day the packages appear,
# fidelity is provable — and until then they skip cleanly.

needs_pacmap = pytest.mark.skipif(
    importlib.util.find_spec("pacmap") is None, reason="requires pacmap"
)
needs_hdbscan = pytest.mark.skipif(
    importlib.util.find_spec("hdbscan") is None, reason="requires hdbscan"
)


def _blob_points():
    """reduce.rs:112-117's two-blob 8-dim fixture, verbatim values."""
    import numpy as np

    pts = []
    for i in range(40):
        base = 0.0 if i % 2 == 0 else 5.0
        pts.append([base + (i * j % 3) * 0.01 for j in range(8)])
    return np.array(pts, dtype=np.float32)


@needs_pacmap
def test_pacmap_shape_and_seeded_drift():  # pragma: no cover - gated
    """reduce.rs:109-135: requested dimensionality comes back, and the
    same seed + input reproduces the embedding to within 1e-2 (PaCMAP's
    parallel float reductions are close-but-not-bit-exact)."""
    import numpy as np

    from polars_text_spark.operators.topic_modeling.reduce import (
        reduce_embeddings,
    )

    pts = _blob_points()
    a = reduce_embeddings(pts, dims=3, seed=7)
    assert a.shape == (len(pts), 3)
    b = reduce_embeddings(pts, dims=3, seed=7)
    assert np.abs(a - b).max() < 1e-2


@needs_pacmap
def test_pacmap_sampled_fit_transform_covers_all_rows():  # pragma: no cover
    """The sampled-fit path must route out-of-sample rows through the
    fitted reducer's transform (reduce.py pacmap branch)."""
    import numpy as np

    from polars_text_spark.operators.topic_modeling.reduce import (
        reduce_with_sampled_fit,
    )

    pts = _blob_points()
    fit_idx = np.arange(0, len(pts), 2)
    out = reduce_with_sampled_fit(pts, fit_idx, dims=3, seed=7)
    assert out.shape == (len(pts), 3)
    assert np.isfinite(out).all()


@needs_hdbscan
def test_hdbscan_separates_blobs_and_marks_outlier():  # pragma: no cover
    """cluster.rs:96-126 verbatim fixture: two tight blobs + one
    far-flung outlier -> 2 topics, outlier labeled -1, labels
    contiguous from 0."""
    import numpy as np

    from polars_text_spark.operators.topic_modeling.cluster import (
        OUTLIER_LABEL,
        cluster,
    )

    points = (
        [[0.0 + i * 0.01, 0.0] for i in range(10)]
        + [[10.0 + i * 0.01, 10.0] for i in range(10)]
        + [[100.0, 100.0]]
    )
    labels, n_topics = cluster(
        np.array(points, dtype=np.float32), min_cluster_size=5
    )
    assert n_topics == 2
    assert labels[-1] == OUTLIER_LABEL
    assert all(l == OUTLIER_LABEL or 0 <= l < 2 for l in labels)


@needs_hdbscan
def test_hdbscan_trivial_cases():  # pragma: no cover - gated
    """cluster.rs:128-141: single point -> one trivial topic; empty ->
    zero topics. (These guards live ABOVE the hdbscan dispatch, so this
    pins the contract with the real library importable.)"""
    import numpy as np

    from polars_text_spark.operators.topic_modeling.cluster import cluster

    labels, n_topics = cluster(np.array([[1.0, 2.0]], dtype=np.float32))
    assert n_topics == 1 and labels.tolist() == [0]
    labels, n_topics = cluster(np.empty((0, 2), dtype=np.float32))
    assert n_topics == 0 and len(labels) == 0


# ---------------------------------------------------------------------------
# Japanese / Korean morpheme backends (reference src/tokenizer.rs:162-185,
# dict protocol src/lindera_dict.rs:29-86). Gated like the jieba test:
# linguistic properties + the offsets invariant, not exact tokens.
# ---------------------------------------------------------------------------

needs_ja = pytest.mark.skipif(
    importlib.util.find_spec("fugashi") is None
    and importlib.util.find_spec("sudachipy") is None,
    reason="requires fugashi or sudachipy",
)
needs_mecab_ko = pytest.mark.skipif(
    importlib.util.find_spec("mecab") is None,
    reason="requires python-mecab-ko",
)


@needs_ja
@pytest.mark.parametrize(
    "model_id",
    ["lindera:ja-ipadic", "lindera:ja-ipadic-neologd", "lindera:ja-unidic"],
)
def test_japanese_backend_properties(model_id):  # pragma: no cover - gated
    backend = load_backend(model_id)
    text = "すもももももももものうち"
    out = backend.tokenize(text, False, True)
    tokens = [t["token"] for t in out]
    # Morpheme segmentation: fewer tokens than characters, at least one
    # multi-char morpheme (reference tests gate on the same shape).
    assert 1 < len(tokens) < len(text)
    assert any(len(t) > 1 for t in tokens)
    # char offsets reconstruct the source (sweep/sudachi both)
    for t in out:
        assert text[t["start"] : t["end"]] == t["token"]


@needs_ja
def test_japanese_backend_caseless():  # pragma: no cover - gated
    """ja is a caseless script: lowercase=True must not change offsets
    (case_aware=False skips the fold, src/tokenizer.rs:95-117)."""
    backend = load_backend("lindera:ja-ipadic")
    text = "Pythonで日本語を解析する"
    assert backend.tokenize(text, True, True) == backend.tokenize(
        text, False, True
    )


@needs_mecab_ko
def test_korean_backend_properties():  # pragma: no cover - gated
    backend = load_backend("lindera:ko-dic")
    text = "아버지가 방에 들어가신다"
    out = backend.tokenize(text, False, True)
    tokens = [t["token"] for t in out]
    # Morpheme analysis splits the agglutinated verb: MORE tokens than
    # the 3 whitespace words, and offsets reconstruct the source.
    assert len(tokens) > 3
    for t in out:
        assert text[t["start"] : t["end"]] == t["token"]


def test_sweep_surface_offsets_invariants():
    """Ungated: the cursor sweep shared by the fugashi/mecab-ko paths.
    Whitespace the analyzer dropped is skipped over; duplicate surfaces
    bind left-to-right; an unlocatable (normalized) surface is dropped,
    never misplaced."""
    from polars_text_spark.functions.tokenize import _sweep_surface_offsets

    text = "ab ab  cd"
    recs = _sweep_surface_offsets(text, ["ab", "ab", "cd"])
    assert recs == [("ab", 0, 2), ("ab", 3, 5), ("cd", 7, 9)]
    for tok, s, e in recs:
        assert text[s:e] == tok
    # analyzer-normalized surface absent from raw text -> dropped
    assert _sweep_surface_offsets("abc", ["ABC"]) == []
    # empty surfaces ignored, later ones still bind
    assert _sweep_surface_offsets("xy", ["", "y"]) == [("y", 1, 2)]
