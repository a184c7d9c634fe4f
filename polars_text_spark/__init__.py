"""polars_text_spark — a PySpark-native text-analytics engine.

A brand-new, idiomatic-Spark implementation of the query and
data-processing capabilities of
``Australian-Text-Analytics-Platform/polars-text`` (the reference; see
SURVEY.md). The reference is a Polars expression plugin; this engine
re-expresses every operator Spark-first:

- scalar text ops (clean/word/char/sentence) are pure built-in Column
  expressions — zero UDFs, full Catalyst pushdown/codegen;
- tokenize/concordance/embedding are Arrow-batched pandas UDFs with
  executor-local model registries;
- token frequency statistics are a distributed outer-join + column
  arithmetic (the reference computes them on driver-side dicts);
- topic modeling is a DataFrame -> DataFrame multi-stage job
  (mirroring the reference's ``is_elementwise=False`` break from the
  expression model);
- beyond-reference: dedup (exact/MinHash-LSH/SimHash/ngram-Jaccard/
  embedding-cosine, plus paragraph-level stats and boilerplate
  strip/rebuild), ANN similarity search (exact/LSH/IVF/int8),
  language-ID / quality scoring / line-level Gopher heuristics, PII
  scan + redaction, as-of / bucketed-interval / salted skew joins,
  deterministic sampling + mixture rebalancing, sequence packing,
  multimodal binary-column plumbing, and streaming-safe variants —
  the LLM-training-data-pipeline operators the reference lacks,
  designed for 100 TB scale.
"""

from __future__ import annotations

from polars_text_spark import models
from polars_text_spark.functions import (
    char_count,
    clean_text,
    concordance,
    embedding,
    sentence_count,
    sentence_segments,
    tokenize,
    word_count,
)
from polars_text_spark.functions.dict_cache import prefetch_dictionary
from polars_text_spark.models import (
    LINDERA_MODELS_BY_LANGUAGE,
    PREDEFINED_MODEL_LABELS,
    PREDEFINED_MODELS,
    available_features,
    list_loaded_models,
    predefined_model_records,
    prefetch_model,
)
from polars_text_spark.operators.asof import asof_join, gapfill_locf
from polars_text_spark.operators.classifier import (
    integer_classifier_margins,
    train_hashed_perceptron,
)
from polars_text_spark.operators.robots import (
    parse_robots,
    robots_verdict,
)
from polars_text_spark.operators.bloom import (
    bloom_fit,
    bloom_might_contain,
    bloom_params,
    bloom_semi_join,
    rebuild_bloom_store,
)
from polars_text_spark.operators.components import (
    connected_components,
    duplicate_clusters,
)
from polars_text_spark.operators.decontam import (
    embedding_contamination,
    ngram_contamination,
)
from polars_text_spark.operators.dedup import (
    band_bucket_stats,
    containment_pairs,
    dedup_threshold_sweep,
    bottomk_sketch,
    bottomk_sketch_pairs,
    dup_source_matrix,
    exact_dedup,
    lsh_band_stats,
    minhash_lsh_cross_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    resolve_band_cap,
    set_similarity_jaccard_pairs,
    sha_token_hash,
    simhash,
    simhash_pairs,
)
from polars_text_spark.operators.packing import (
    fim_transform,
    pack_sequences,
    sequence_manifest,
)
from polars_text_spark.operators.quality import (
    bigram_surprisal,
    doc_bigrams,
    quantile_buckets,
    unigram_frequencies,
    unigram_surprisal,
)
from polars_text_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    temperature_rebalance,
    weighted_sample,
)
from polars_text_spark.operators.chunks import (
    chunk_dup_stats,
    explode_chunks,
    strip_common_lines,
    strip_duplicate_chunks,
)
from polars_text_spark.operators.interval import interval_join
from polars_text_spark.operators.dedup_store import (
    append_minhash_shard,
    band_stats_from_store,
    incremental_pairs_from_store,
    pairs_from_store,
    rebucket_minhash_store,
    rebuild_minhash_store,
    write_minhash_store,
)
from polars_text_spark.operators.ann_store import (
    append_ann_shard,
    rebucket_store,
    topk_against_shard,
    topk_from_store,
    write_ann_store,
)
from polars_text_spark.operators.bitext import bitext_mine
from polars_text_spark.operators.bpe import bpe_learn, bpe_segment
from polars_text_spark.operators.chat import (
    chat_stats,
    parse_chat,
    render_chat,
)
from polars_text_spark.operators.contrastive import (
    contrastive_triplets,
    hard_negatives,
)
from polars_text_spark.operators.budget import apply_epoch_plan, epoch_plan
from polars_text_spark.operators.dsir import (
    dsir_fit,
    dsir_log_weights,
    dsir_sample,
    dsir_topk,
)
from polars_text_spark.operators.phash import (
    chunk_hamming_pairs,
    dhash_pairs,
    with_dhash,
)
from polars_text_spark.operators.graph import pagerank
from polars_text_spark.operators.web import (
    blocklist_verdict,
    canonical_url_frequencies,
    canonicalize_url,
    domain_frequencies,
    domain_link_edges,
    domain_suffixes,
    extract_urls,
    link_stats,
    url_domains,
)
from polars_text_spark.operators.pii import pii_counts, redact_pii
from polars_text_spark.operators.search import bm25_scores, bm25_topk
from polars_text_spark.operators.skew import salted_join
from polars_text_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    cosine_topk_quantized,
    quantize_vec,
    with_l2_normalized,
    with_quantized,
)
from polars_text_spark.operators.token_frequencies import (
    token_frequencies,
    token_frequency_stats,
)
from polars_text_spark.operators.filters import (
    FilterRule,
    apply_filter_rules,
    with_gopher_tags,
)
from polars_text_spark.operators.semdedup import (
    kmeans_assign,
    semantic_dup_pairs,
)
from polars_text_spark.operators.spans import (
    dup_ngram_coverage,
    strip_duplicate_spans,
)
from polars_text_spark.operators.topic_modeling import topic_modeling
from polars_text_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
    with_winnow_fingerprints,
)
from polars_text_spark.operators.linguistics import (
    collocations,
    node_collocates,
    dispersion,
    ngram_counts,
    prefix_boilerplate,
    term_dispersion_bins,
    vocab_spelling_pairs,
)
from polars_text_spark.operators.snapshots import snapshot_diff
from polars_text_spark.session import get_spark
from polars_text_spark.sql import register_sql_functions

__version__ = "0.1.0"

__all__ = [
    "collocations",
    "dispersion",
    "ngram_counts",
    "node_collocates",
    "prefix_boilerplate",
    "snapshot_diff",
    "term_dispersion_bins",
    "vocab_spelling_pairs",
    "LINDERA_MODELS_BY_LANGUAGE",
    "PREDEFINED_MODELS",
    "PREDEFINED_MODEL_LABELS",
    "asof_join",
    "gapfill_locf",
    "bloom_fit",
    "bloom_might_contain",
    "bloom_params",
    "bloom_semi_join",
    "sentence_segments",
    "parse_robots",
    "robots_verdict",
    "integer_classifier_margins",
    "train_hashed_perceptron",
    "available_features",
    "bm25_scores",
    "bigram_surprisal",
    "bottomk_sketch",
    "band_bucket_stats",
    "bottomk_sketch_pairs",
    "doc_bigrams",
    "dup_source_matrix",
    "bm25_topk",
    "char_count",
    "clean_text",
    "concordance",
    "connected_components",
    "bitext_mine",
    "chat_stats",
    "contrastive_triplets",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "cosine_topk_quantized",
    "apply_epoch_plan",
    "epoch_plan",
    "chunk_hamming_pairs",
    "dhash_pairs",
    "with_dhash",
    "deterministic_sample",
    "dsir_fit",
    "dsir_log_weights",
    "dsir_sample",
    "dsir_topk",
    "duplicate_clusters",
    "embedding",
    "containment_pairs",
    "dedup_threshold_sweep",
    "exact_dedup",
    "get_spark",
    "list_loaded_models",
    "minhash_lsh_cross_pairs",
    "lsh_band_stats",
    "minhash_lsh_pairs",
    "models",
    "embedding_contamination",
    "ngram_contamination",
    "ngram_jaccard_pairs",
    "fim_transform",
    "pack_sequences",
    "band_stats_from_store",
    "pairs_from_store",
    "rebucket_minhash_store",
    "rebucket_store",
    "rebuild_minhash_store",
    "rebuild_bloom_store",
    "resolve_band_cap",
    "append_minhash_shard",
    "append_ann_shard",
    "topk_against_shard",
    "topk_from_store",
    "write_ann_store",
    "blocklist_verdict",
    "bpe_learn",
    "bpe_segment",
    "canonical_url_frequencies",
    "canonicalize_url",
    "domain_frequencies",
    "domain_link_edges",
    "domain_suffixes",
    "extract_urls",
    "link_stats",
    "pagerank",
    "parse_chat",
    "url_domains",
    "predefined_model_records",
    "prefetch_dictionary",
    "quantile_buckets",
    "prefetch_model",
    "chunk_dup_stats",
    "dup_ngram_coverage",
    "explode_chunks",
    "FilterRule",
    "apply_filter_rules",
    "with_gopher_tags",
    "incremental_pairs_from_store",
    "kmeans_assign",
    "semantic_dup_pairs",
    "hard_negatives",
    "interval_join",
    "pii_counts",
    "quantize_vec",
    "redact_pii",
    "render_chat",
    "salted_join",
    "strip_common_lines",
    "strip_duplicate_chunks",
    "strip_duplicate_spans",
    "with_l2_normalized",
    "with_quantized",
    "with_winnow_fingerprints",
    "register_sql_functions",
    "sentence_count",
    "sequence_manifest",
    "set_similarity_jaccard_pairs",
    "sha_token_hash",
    "simhash",
    "simhash_pairs",
    "stratified_sample",
    "temperature_rebalance",
    "weighted_sample",
    "token_frequencies",
    "token_frequency_stats",
    "tokenize",
    "unigram_frequencies",
    "unigram_surprisal",
    "topic_modeling",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "write_minhash_store",
    "word_count",
]
