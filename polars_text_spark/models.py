"""Tokenizer model inventory + executor-local registry helpers.

Mirrors the reference's curated inventory verbatim
(/root/reference/polars_text/models.py:22-57, src/tokenizer.rs:19-28)
and its prefetch/list APIs (src/lib.rs:94-125). The reference keeps a
``HashMap<model_id, Backend>`` behind an ``RwLock`` inside one process;
on Spark the registry is a module-level dict inside each executor's
Python worker (workers are reused via ``spark.python.worker.reuse``),
and ``prefetch_model`` can warm every executor with a tiny
``foreachPartition`` job.

Feature gating: the reference compiles optional Cargo features and its
Python wrappers raise ``RuntimeError`` before registering an expression
when a feature is missing (src/lib.rs:38-61,
polars_text/functions.py:14-19). Here features are optional Python
dependencies probed at import time — same guard-before-use contract.
"""

from __future__ import annotations

import importlib.util
from typing import Final

__all__ = [
    "LINDERA_MODELS_BY_LANGUAGE",
    "PREDEFINED_MODELS",
    "PREDEFINED_MODEL_LABELS",
    "available_features",
    "list_loaded_models",
    "predefined_model_records",
    "prefetch_model",
    "require_feature",
]

#: Predefined model IDs -> language codes. Inventory only, not policy.
PREDEFINED_MODELS: Final[dict[str, tuple[str, ...]]] = {
    "native:plain_words_en": ("en",),
    "huggingface:bert-base-uncased": ("en",),
    "lindera:cc-cedict": ("zh",),
    "lindera:jieba": ("zh",),
    "lindera:ja-ipadic": ("ja",),
    "lindera:ja-ipadic-neologd": ("ja",),
    "lindera:ja-unidic": ("ja",),
    "lindera:ko-dic": ("ko",),
}

#: Human-facing labels for the predefined inventory.
PREDEFINED_MODEL_LABELS: Final[dict[str, str]] = {
    "native:plain_words_en": "Plain words (English)",
    "huggingface:bert-base-uncased": "BERT base uncased",
    "lindera:cc-cedict": "CC-CEDICT",
    "lindera:jieba": "Jieba",
    "lindera:ja-ipadic": "IPADIC",
    "lindera:ja-ipadic-neologd": "IPADIC Neologd",
    "lindera:ja-unidic": "UniDic",
    "lindera:ko-dic": "ko-dic",
}

#: Dictionary-backed CJK tokenizer IDs grouped by supported language.
LINDERA_MODELS_BY_LANGUAGE: Final[dict[str, tuple[str, ...]]] = {
    "zh": ("lindera:cc-cedict", "lindera:jieba"),
    "ja": (
        "lindera:ja-ipadic",
        "lindera:ja-ipadic-neologd",
        "lindera:ja-unidic",
    ),
    "ko": ("lindera:ko-dic",),
}


def _probe(module: str) -> bool:
    return importlib.util.find_spec(module) is not None


def available_features() -> frozenset[str]:
    """Which optional capabilities this install supports.

    ≙ the reference's ``compiled_features()`` (src/lib.rs:38-61). The
    native tokenizer, concordance, frequency stats, dedup, similarity
    and topic-modeling plumbing are always available (pure
    PySpark/numpy); real HF tokenizers / CJK segmenters / ONNX
    embedders need their optional packages.
    """
    features = {"tokenization", "cache", "topic-modeling", "embedding"}
    if _probe("tokenizers"):
        features.add("hf-tokenizers")
    if _probe("jieba"):
        features.add("jieba")
    if _probe("fugashi") or _probe("sudachipy"):
        features.add("ja-segmentation")
    if _probe("mecab_ko") or _probe("mecab"):
        features.add("ko-segmentation")
    if _probe("onnxruntime"):
        features.add("onnx-embedding")
    if len(features) >= 8:
        features.add("full")
    return frozenset(features)


def require_feature(feature: str, operation: str) -> None:
    """Raise before any plan is built if a capability is missing —
    same eager contract as the reference
    (polars_text/functions.py:14-19)."""
    if feature not in available_features():
        raise RuntimeError(
            f"{operation} requires the '{feature}' feature; install the "
            "matching optional dependency (see polars_text_spark.models)"
        )


def normalise_model(model: str | None, operation: str = "tokenize") -> str:
    """Reject missing/blank model IDs eagerly
    (polars_text/functions.py:22-25)."""
    if model is None or not model.strip():
        raise ValueError(f"{operation} requires an explicit tokenizer model ID")
    return model.strip()


def prefetch_model(model_id: str, spark=None, num_slots: int | None = None) -> None:
    """Warm the tokenizer registry.

    Driver-side always warms the local registry. When ``spark`` is
    given, also runs a tiny job that loads the model in every executor
    Python worker, so the first user-visible tokenize call doesn't
    block on model construction/download (≙ src/lib.rs:94-105).
    """
    from polars_text_spark.functions.tokenize import load_backend

    load_backend(normalise_model(model_id, "prefetch_model"))
    if spark is not None:
        slots = num_slots or spark.sparkContext.defaultParallelism

        def _warm(_idx):
            load_backend(model_id)
            return []

        spark.sparkContext.parallelize(range(slots), slots).flatMap(_warm).count()


def list_loaded_models() -> list[str]:
    """Model IDs cached in this process's registry (driver-side view;
    executor registries are per-worker and reported best-effort)."""
    from polars_text_spark.functions.tokenize import loaded_models

    return loaded_models()


def predefined_model_records() -> list[dict[str, object]]:
    """Predefined tokenizer model records for API clients."""
    return [
        {
            "model": model,
            "label": PREDEFINED_MODEL_LABELS.get(model, model),
            "languages": list(languages),
        }
        for model, languages in PREDEFINED_MODELS.items()
    ]
