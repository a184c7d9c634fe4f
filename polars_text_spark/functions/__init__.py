"""Column-level text functions (the reference's expression surface).

Usage mirrors idiomatic Spark::

    from polars_text_spark import functions as T
    df.select(T.clean_text("text"), T.tokenize("text", model="native:plain_words_en"))
"""

from __future__ import annotations

from polars_text_spark.functions.analysis import (
    compression_ratio,
    char_class_ratios,
    char_entropy,
    detect_language,
    doc_fingerprint,
    dup_word_frac,
    license_signals,
    line_stats,
    mojibake_signals,
    normalize_text,
    quality_score,
    readability,
    remove_stopwords,
    token_count_bpe,
    token_count_ws,
    ws_token_array,
)
from polars_text_spark.functions.concordance import concordance
from polars_text_spark.functions.dict_cache import (
    ensure_dict,
    prefetch_dictionary,
)
from polars_text_spark.functions.embedding import embedding
from polars_text_spark.functions.html import extract_html_text, html_hrefs
from polars_text_spark.functions.scalar import (
    char_count,
    clean_text,
    sentence_count,
    sentence_segments,
    word_count,
)
from polars_text_spark.functions.tokenize import tokenize

__all__ = [
    "compression_ratio",
    "char_class_ratios",
    "char_count",
    "char_entropy",
    "clean_text",
    "concordance",
    "detect_language",
    "doc_fingerprint",
    "ensure_dict",
    "prefetch_dictionary",
    "dup_word_frac",
    "extract_html_text",
    "html_hrefs",
    "license_signals",
    "line_stats",
    "mojibake_signals",
    "embedding",
    "normalize_text",
    "remove_stopwords",
    "quality_score",
    "readability",
    "sentence_count",
    "sentence_segments",
    "token_count_bpe",
    "token_count_ws",
    "tokenize",
    "word_count",
    "ws_token_array",
]
