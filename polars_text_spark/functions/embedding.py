"""Sentence embeddings as Arrow-batched pandas UDFs.

Re-expresses /root/reference/src/expressions.rs:555-752 +
src/topic_modeling/embedding.rs:

- input polymorphism: a string column -> ``array<float>``; an
  ``array<string>`` column -> ``array<array<float>>``
  (src/expressions.rs:38-51,574-582). Spark Columns are not typed at
  expression-build time, so the polymorphic dispatch lives in
  :func:`embed_column` (DataFrame-aware); ``embedding`` defaults to the
  string path with an explicit ``input="list"`` override;
- null string -> empty vector; null item inside a list -> empty inner
  vector (src/expressions.rs:663-687,702-717);
- mean-pool over attention mask + L2-normalize
  (src/topic_modeling/embedding.rs:189-250);
- default model ``onnx-community/all-MiniLM-L6-v2-ONNX`` (384-dim,
  embedding.rs:37), batch 32 (src/expressions.rs:570), truncation 512
  (embedding.rs:40-42).

Backends load once per executor Python worker (registry ≙
embedding.rs:252-282). ONNX Runtime is an optional dependency; this
container ships without it, so the always-available backend is
``native:feature-hash[:dim]`` — a deterministic feature-hashing
embedder (token -> signed bucket, L2-normalized). It is a real
vector-space model (similar texts -> high cosine), fully
deterministic across workers, and exercises the identical Spark
plumbing (schema, batching, registry) the ONNX path uses.
"""

from __future__ import annotations

import hashlib
import threading
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_text_spark.functions.tokenize import plain_word_records

__all__ = [
    "DEFAULT_EMBEDDER_MODEL",
    "FEATURE_HASH_MODEL",
    "embed_column",
    "embed_texts",
    "embedding",
    "embeddings_from_output",
    "list_loaded_embedders",
    "mean_pool_normalize",
    "normalize_rows",
    "prefetch_embedder",
]

DEFAULT_EMBEDDER_MODEL = "onnx-community/all-MiniLM-L6-v2-ONNX"
FEATURE_HASH_MODEL = "native:feature-hash"
_DEFAULT_BATCH_SIZE = 32  # src/expressions.rs:570
_TRUNCATE_TOKENS = 512  # embedding.rs:40-42

VECTOR_TYPE = T.ArrayType(T.FloatType(), containsNull=False)
NESTED_VECTOR_TYPE = T.ArrayType(VECTOR_TYPE, containsNull=False)


class _FeatureHashEmbedder:
    """Deterministic hashing embedder: each token hashes to a bucket and
    a sign; the text vector is the L2-normalized signed bag-of-buckets.
    Stable across processes (md5/sha256, not Python's salted hash).

    ``token_hash="sha"`` is the engine-portable audit variant (model id
    ``native:feature-hash-sha[:dim]``): bucket and sign come from the
    60-bit sha256 hex prefix (the same portable hash as
    ``operators.dedup.sha_token_hash``), and normalization runs in
    float64 before the float32 cast — so a DuckDB oracle recomputing
    ``('0x' || substr(sha256(t),1,15))::BIGINT`` per token and
    ``v / sqrt(sum(v*v))`` per doc reproduces every output value
    bit-for-bit (both engines do the identical IEEE-double division on
    exact integer inputs, then the identical double->float32 rounding).
    """

    def __init__(self, dim: int = 64, token_hash: str = "md5") -> None:
        if token_hash not in ("md5", "sha"):
            raise ValueError(f"token_hash must be 'md5' or 'sha', got {token_hash!r}")
        self.dim = dim
        self.token_hash = token_hash
        # Natural-language token frequency is Zipfian — memoizing the
        # per-token hash turns most lookups into dict hits.
        self._bucket_cache: dict[str, tuple[int, float]] = {}

    def _token_bucket(self, token: str) -> tuple[int, float]:
        cached = self._bucket_cache.get(token)
        if cached is not None:
            return cached
        if self.token_hash == "sha":
            h = int(hashlib.sha256(token.encode("utf-8")).hexdigest()[:15], 16)
            bucket = h % self.dim
            sign = 1.0 if (h >> 59) & 1 else -1.0
        else:
            digest = hashlib.md5(token.encode("utf-8")).digest()
            bucket = int.from_bytes(digest[:4], "little") % self.dim
            sign = 1.0 if digest[4] & 1 else -1.0
        result = (bucket, sign)
        if len(self._bucket_cache) < 1_000_000:
            self._bucket_cache[token] = result
        return result

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        # Accumulate in float64: the signed counts are integer-exact,
        # and doing the norm + division in doubles makes the sha
        # variant's output the deterministic double->float32 rounding
        # of a value any SQL engine can recompute (see class docs).
        acc = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            tokens = [
                t for t, _, _ in plain_word_records(text.lower(), True)
            ][:_TRUNCATE_TOKENS]
            for token in tokens:
                bucket, sign = self._token_bucket(token)
                acc[i, bucket] += sign
            norm = float(np.linalg.norm(acc[i]))
            if norm > 0.0:
                acc[i] /= norm
        return acc.astype(np.float32)


def mean_pool_normalize(hidden: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Mean-pool ``(batch, seq, dim)`` hidden states over a
    ``(batch, seq)`` attention mask, then L2-normalize each row.

    Pure numpy twin of the reference's mean_pool_normalize
    (src/topic_modeling/embedding.rs:189-250) — kept free of ONNX
    Runtime so the golden tests (embedding.rs:445-465) run everywhere.
    """
    hidden = np.asarray(hidden, dtype=np.float32)
    m = np.asarray(mask, dtype=np.float32)
    if hidden.ndim != 3 or m.shape != hidden.shape[:2]:
        raise ValueError(
            f"expected hidden (batch, seq, dim) with mask (batch, seq); "
            f"got {hidden.shape} and {m.shape}"
        )
    counts = np.maximum(m.sum(axis=1), 1e-9)[:, None]
    pooled = (hidden * m[:, :, None]).sum(axis=1) / counts
    return normalize_rows(pooled)


def normalize_rows(rows: np.ndarray) -> np.ndarray:
    """L2-normalize each row; zero rows stay zero (embedding.rs:238-250)."""
    rows = np.asarray(rows, dtype=np.float32)
    norms = np.linalg.norm(rows, axis=1, keepdims=True)
    return np.where(norms > 0.0, rows / np.maximum(norms, 1e-30), rows)


def embeddings_from_output(
    output: np.ndarray, batch: int, mask: np.ndarray
) -> np.ndarray:
    """Dispatch on the ONNX output shape exactly like the reference
    (embedding.rs:168-187): ``[batch, dim]`` -> row-normalize,
    ``[batch, seq, dim]`` -> mean-pool + normalize."""
    out = np.asarray(output, dtype=np.float32)
    if out.ndim == 2 and out.shape[0] == batch:
        return normalize_rows(out)
    if out.ndim == 3 and out.shape[:2] == tuple(np.asarray(mask).shape):
        return mean_pool_normalize(out, mask)
    raise ValueError(
        f"unsupported ONNX embedding output shape {out.shape}; "
        "expected [batch, dim] or [batch, seq, dim]"
    )


# ONNX artifact candidates, in the reference's probe order
# (embedding.rs:329-341).
_ONNX_CANDIDATES = (
    "model.onnx",
    "onnx/model.onnx",
    "onnx/model_quantized.onnx",
    "onnx/model_qint8_avx512.onnx",
    "onnx/model_quantized_uint8.onnx",
)


class _OnnxEmbedder:
    """Real ONNX sentence-encoder path, live whenever the optional deps
    (onnxruntime + tokenizers) import and the model artifacts resolve —
    from a local directory, the standard Hugging Face cache, or a hub
    download when huggingface_hub is importable. Mirrors the
    reference's loader (src/topic_modeling/embedding.rs:284-326):
    config.json hidden_size, tokenizer.json with truncation 512,
    first-output session, mean-pool + L2."""

    def __init__(self, repo: str) -> None:
        try:
            import onnxruntime
            from tokenizers import Tokenizer
        except ImportError as exc:
            raise RuntimeError(
                f"embedder '{repo}' requires onnxruntime + tokenizers; "
                f"use '{FEATURE_HASH_MODEL}' for a dependency-free "
                "deterministic embedder"
            ) from exc

        config_path, tokenizer_path, onnx_path = self._resolve_artifacts(repo)
        self.hidden_size = 0
        try:
            import json

            with open(config_path, "r", encoding="utf-8") as fh:
                self.hidden_size = int(json.load(fh).get("hidden_size", 0))
        except (OSError, ValueError):  # infer from output at runtime
            pass
        self.tokenizer = Tokenizer.from_file(str(tokenizer_path))
        self.tokenizer.enable_truncation(max_length=_TRUNCATE_TOKENS)
        self.tokenizer.enable_padding()  # batch-longest (embedding.rs:213-217)
        self.session = onnxruntime.InferenceSession(
            str(onnx_path), providers=["CPUExecutionProvider"]
        )
        self.input_names = [i.name for i in self.session.get_inputs()]
        self.output_name = self.session.get_outputs()[0].name
        self.model_id = repo

    @staticmethod
    def _resolve_artifacts(repo: str):
        """(config.json, tokenizer.json, model.onnx) paths for ``repo``:
        a local directory, the HF cache (offline), or a hub download."""
        import os

        def from_dir(root: str):
            cfg = os.path.join(root, "config.json")
            tok = os.path.join(root, "tokenizer.json")
            if not (os.path.isfile(cfg) and os.path.isfile(tok)):
                return None
            for cand in _ONNX_CANDIDATES:
                onnx = os.path.join(root, cand)
                if os.path.isfile(onnx):
                    return cfg, tok, onnx
            return None

        if os.path.isdir(repo):
            found = from_dir(repo)
            if found:
                return found
            raise RuntimeError(
                f"local model dir '{repo}' is missing config.json / "
                f"tokenizer.json / one of {_ONNX_CANDIDATES}"
            )
        # Import ONLY hf_hub_download behind the not-installed gate:
        # older huggingface_hub versions predate the ``errors`` module,
        # and importing a sentinel class from it would trip the
        # ImportError path below and mis-report "not installed".
        try:
            from huggingface_hub import hf_hub_download
        except ImportError:
            raise RuntimeError(
                f"model '{repo}' not found locally and huggingface_hub is "
                f"not installed; pass a local model directory or use "
                f"'{FEATURE_HASH_MODEL}'"
            ) from None
        try:

            def fetch(filename: str, required: bool):
                try:
                    return hf_hub_download(repo, filename)
                except Exception:
                    if required:
                        raise
                    return None

            cfg = fetch("config.json", True)
            tok = fetch("tokenizer.json", True)
            for cand in _ONNX_CANDIDATES:
                onnx = fetch(cand, False)
                if onnx is not None:
                    # companion external-weights file, if any
                    fetch(f"{cand}_data", False)
                    return cfg, tok, onnx
            raise FileNotFoundError(
                f"no ONNX artifact in {repo}; tried {_ONNX_CANDIDATES}"
            )
        except Exception as exc:
            raise RuntimeError(
                f"could not fetch ONNX artifacts for '{repo}': {exc}; "
                f"pass a local model directory or use '{FEATURE_HASH_MODEL}'"
            ) from exc

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.empty((0, self.hidden_size), dtype=np.float32)
        encodings = self.tokenizer.encode_batch(texts)
        ids = np.array([e.ids for e in encodings], dtype=np.int64)
        mask = np.array([e.attention_mask for e in encodings], dtype=np.int64)
        if ids.shape[1] == 0:
            return np.zeros((len(texts), self.hidden_size), dtype=np.float32)
        feeds = {"input_ids": ids, "attention_mask": mask}
        if "token_type_ids" in self.input_names:
            feeds["token_type_ids"] = np.array(
                [e.type_ids for e in encodings], dtype=np.int64
            )
        outputs = self.session.run([self.output_name], feeds)
        return embeddings_from_output(outputs[0], len(texts), mask)


_EMBEDDERS: dict[str, object] = {}
_EMBEDDERS_LOCK = threading.Lock()


def _build_embedder(model_id: str):
    if model_id.startswith(FEATURE_HASH_MODEL):
        suffix = model_id[len(FEATURE_HASH_MODEL) :]
        token_hash = "md5"
        if suffix.startswith("-sha"):
            token_hash = "sha"
            suffix = suffix[len("-sha") :]
        if suffix == "":
            dim = 64
        elif suffix.startswith(":"):
            dim = int(suffix[1:])
        else:
            raise ValueError(
                f"unknown feature-hash model id '{model_id}'; expected "
                f"'{FEATURE_HASH_MODEL}[-sha][:dim]'"
            )
        return _FeatureHashEmbedder(dim, token_hash=token_hash)
    return _OnnxEmbedder(model_id)


def load_embedder(model_id: str):
    """Double-checked-locked registry (embedding.rs:252-282)."""
    emb = _EMBEDDERS.get(model_id)
    if emb is not None:
        return emb
    with _EMBEDDERS_LOCK:
        emb = _EMBEDDERS.get(model_id)
        if emb is None:
            emb = _build_embedder(model_id)
            _EMBEDDERS[model_id] = emb
        return emb


def prefetch_embedder(repo_id: str | None = None, spark=None) -> None:
    """Warm the embedder registry (≙ src/lib.rs:156-187)."""
    model_id = repo_id or DEFAULT_EMBEDDER_MODEL
    load_embedder(model_id)
    if spark is not None:
        slots = spark.sparkContext.defaultParallelism
        spark.sparkContext.parallelize(range(slots), slots).flatMap(
            lambda _: (load_embedder(model_id), [])[1]
        ).count()


def list_loaded_embedders() -> list[str]:
    return list(_EMBEDDERS)


def embed_texts(
    texts: list[str | None], model_id: str, batch_size: int
) -> list[np.ndarray]:
    """Embed with null -> empty-vector semantics and inner mini-batching."""
    embedder = load_embedder(model_id)
    out: list[np.ndarray] = [np.empty(0, dtype=np.float32)] * len(texts)
    live = [(i, t) for i, t in enumerate(texts) if t is not None]
    for lo in range(0, len(live), batch_size):
        chunk = live[lo : lo + batch_size]
        vectors = embedder.embed_batch([t for _, t in chunk])
        for (i, _), vec in zip(chunk, vectors):
            out[i] = vec.astype(np.float32)
    return out


def _resolve(model: str | None, batch_size: int | None) -> tuple[str, int]:
    model_id = (model or DEFAULT_EMBEDDER_MODEL).strip()
    bs = batch_size if batch_size is not None and batch_size > 0 else _DEFAULT_BATCH_SIZE
    # Fail at plan-build time when the backend can't possibly load —
    # the reference raises before registering the expression, too
    # (polars_text/functions.py:14-19).
    if not model_id.startswith(FEATURE_HASH_MODEL):
        import importlib.util

        if importlib.util.find_spec("onnxruntime") is None:
            raise RuntimeError(
                f"embedder '{model_id}' requires onnxruntime, which is not "
                f"installed; use '{FEATURE_HASH_MODEL}[:dim]' for the "
                "dependency-free deterministic embedder"
            )
    return model_id, bs


def embedding(
    col: Column | str,
    *,
    embedder_model: str | None = None,
    batch_size: int | None = None,
    input: str = "string",
) -> Column:
    """Embed a string column (-> ``array<float>``) or an array<string>
    column (``input="list"`` -> ``array<array<float>>``)."""
    model_id, bs = _resolve(embedder_model, batch_size)
    c = F.col(col) if isinstance(col, str) else col

    if input == "string":

        def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for series in batches:
                vecs = embed_texts(series.tolist(), model_id, bs)
                yield pd.Series(vecs, index=series.index)

        return F.pandas_udf(fn, VECTOR_TYPE)(c).alias("embedding")

    if input == "list":

        def fn_list(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for series in batches:
                rows = []
                for items in series.tolist():
                    if items is None:
                        rows.append([])
                    else:
                        rows.append(embed_texts(list(items), model_id, bs))
                yield pd.Series(rows, index=series.index)

        return F.pandas_udf(fn_list, NESTED_VECTOR_TYPE)(c).alias("embedding")

    raise ValueError(
        "embedding input must be 'string' or 'list' "
        "(src/expressions.rs:574-582 accepts String or List(String))"
    )


def embed_column(
    df: DataFrame,
    col: str,
    *,
    embedder_model: str | None = None,
    batch_size: int | None = None,
    output_col: str = "embedding",
) -> DataFrame:
    """Schema-dispatching wrapper ≙ the reference's input-polymorphic
    output_type_func (src/expressions.rs:38-51)."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.StringType):
        mode = "string"
    elif isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StringType):
        mode = "list"
    else:
        raise TypeError(
            f"embedding expects a string or array<string> column, got {dtype}"
        )
    return df.withColumn(
        output_col,
        embedding(
            col, embedder_model=embedder_model, batch_size=batch_size, input=mode
        ),
    )
