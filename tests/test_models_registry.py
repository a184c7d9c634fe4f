"""Model registry inventory + feature-gate tests (reference:
tests/test_models_registry.py, tests/test_optional_features.py)."""

from __future__ import annotations

import pytest

import polars_text_spark as pts


def test_predefined_inventory_exact():
    assert set(pts.PREDEFINED_MODELS) == {
        "native:plain_words_en",
        "huggingface:bert-base-uncased",
        "lindera:cc-cedict",
        "lindera:jieba",
        "lindera:ja-ipadic",
        "lindera:ja-ipadic-neologd",
        "lindera:ja-unidic",
        "lindera:ko-dic",
    }
    assert pts.PREDEFINED_MODELS["lindera:ko-dic"] == ("ko",)
    assert set(pts.PREDEFINED_MODEL_LABELS) == set(pts.PREDEFINED_MODELS)
    assert pts.LINDERA_MODELS_BY_LANGUAGE["ja"] == (
        "lindera:ja-ipadic",
        "lindera:ja-ipadic-neologd",
        "lindera:ja-unidic",
    )


def test_predefined_model_records_shape():
    records = pts.predefined_model_records()
    assert len(records) == 8
    assert records[0] == {
        "model": "native:plain_words_en",
        "label": "Plain words (English)",
        "languages": ["en"],
    }


def test_available_features_baseline():
    features = pts.available_features()
    # always-on capabilities in this install
    assert {"tokenization", "cache", "topic-modeling", "embedding"} <= features


def test_prefetch_and_list(spark):
    pts.prefetch_model("native:plain_words_en")
    assert "native:plain_words_en" in pts.list_loaded_models()
    # executor warm-up path runs without error
    pts.prefetch_model("native:plain_words_en", spark, num_slots=2)


def test_gated_backend_errors():
    import importlib.util

    from polars_text_spark.functions.tokenize import load_backend

    if importlib.util.find_spec("jieba") is None:
        with pytest.raises(RuntimeError, match="jieba"):
            load_backend("lindera:jieba")
    if (
        importlib.util.find_spec("fugashi") is None
        and importlib.util.find_spec("sudachipy") is None
    ):
        with pytest.raises(RuntimeError, match="segmenter"):
            load_backend("lindera:ja-ipadic")
    if importlib.util.find_spec("mecab") is None:
        with pytest.raises(RuntimeError, match="segmenter"):
            load_backend("lindera:ko-dic")
    with pytest.raises(ValueError, match="unknown tokenizer model id"):
        load_backend("nonsense:model")
