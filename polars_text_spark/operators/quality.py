"""Corpus-relative quality signals for training-data curation.

:func:`polars_text_spark.functions.analysis.quality_score` is
doc-LOCAL (length/punct/stopword ratios). The strongest cheap quality
signal real pipelines add next is corpus-RELATIVE: how surprising a
document's tokens are under the corpus's own unigram distribution
(the zero-dependency stand-in for a KenLM perplexity filter —
gibberish and boilerplate both land in the tails). Everything here is
pure Catalyst: explode → two hash aggregations → one equi-join on
token — no UDF, no driver materialization.

Scale notes (100 TB):
- The vocabulary frame is NOT broadcast: a web-scale corpus has an
  unbounded long tail, so token→count joins shuffle on the token key
  (AQE handles the Zipf skew on stop-tokens; they hash-split fine
  because the join is 1:N, not N:N).
- The corpus total is a 1-row aggregate cross-joined in — a broadcast
  of 8 bytes, not a driver collect.
- Self-scoring (freq table built from the scored corpus itself) is
  one pass; to score a shard against a REFERENCE corpus distribution,
  pass ``freq_df`` (e.g. read from a saved parquet of a previous run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_frequencies", "unigram_surprisal"]


def _ws_tokens(text_col: str):
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return F.filter(toks, lambda t: t != "")


def unigram_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-token unigram counts: ``(token, cnt)``. One explode
    + one groupBy shuffle; save as parquet to reuse as a reference
    distribution across runs."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(_ws_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    freq_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean token surprisal in bits:
    ``mean(-log2(cnt(token) / corpus_total))`` over the doc's
    whitespace tokens (occurrence-weighted).

    ``freq_df`` (``token, cnt`` as from :func:`unigram_frequencies`)
    scores against an external distribution; tokens unseen there get
    a +1-smoothed count so the surprisal stays finite. Default is
    self-scoring, where every token is present by construction.

    Returns ``(id_col, n_tokens, avg_surprisal)``; docs with no
    tokens are absent (no distribution to score against).
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        id_col, F.explode(_ws_tokens(text_col)).alias("token")
    )
    if freq_df is not None:
        freq = freq_df
    else:
        # Self-scoring builds the vocab once and persists it (released
        # via polars_text_spark.persist): without the pin, the total's
        # aggregate re-derives the freq subtree and the corpus gets a
        # THIRD full scan. The vocab frame is ~|vocab| rows — small
        # relative to the corpus at any scale.
        from polars_text_spark.persist import track_persist

        freq = track_persist(unigram_frequencies(df, text_col).persist())
    total = freq.agg(F.sum("cnt").cast("double").alias("__total"))
    scored = (
        toks.join(freq, "token", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (-F.log2(F.coalesce(F.col("cnt"), F.lit(1)) / F.col("__total"))).alias(
                "__bits"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.avg("__bits").alias("avg_surprisal"),
    )
