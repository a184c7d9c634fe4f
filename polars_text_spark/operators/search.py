"""BM25 ranked keyword retrieval over a document corpus.

Beyond-reference text-analytics operator (the reference stops at
concordance/KWIC; ranked retrieval is the natural next step for a
text platform). Okapi BM25:

    score(d, Q) = sum_t idf(t) * tf(t,d)*(k1+1) /
                         (tf(t,d) + k1*(1 - b + b*dl/avgdl))
    idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Scale shape: the big side is scanned once; per-doc term frequencies
come from an explode restricted to the query terms (the filter runs
*inside* the explode so non-query tokens never materialize), then one
shuffle on (doc, term). Corpus stats (N, avgdl, df per term) are
tiny aggregates broadcast back. No UDFs — all whole-stage codegen.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "bm25_topk"]


def _ws_tokens(text: Column) -> Column:
    t = F.trim(F.lower(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing at least one query term.
    Returns ``(id_col, score)`` — callers rank/limit as needed."""
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")

    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), _ws_tokens(F.col(text_col)).alias("_toks")
    )
    base = base.withColumn("_dl", F.size("_toks").cast("double"))

    # Corpus stats: one tiny agg, broadcast back via crossJoin.
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )

    # Only query-term tokens survive the explode.
    tf = (
        base.select(
            id_col,
            "_dl",
            F.explode(
                F.filter(F.col("_toks"), lambda x: x.isin(*terms))
            ).alias("_term"),
        )
        .groupBy(id_col, "_dl", "_term")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )

    df_t = tf.groupBy("_term").agg(
        F.countDistinct(id_col).cast("double").alias("_df")
    )

    scored = (
        tf.join(F.broadcast(df_t), "_term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_contrib",
            F.col("_idf")
            * F.col("_tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("_tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("_contrib").alias("score"))


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 results, deterministic tie-break on the id."""
    scores = bm25_scores(docs, query_terms, text_col, id_col, **kwargs)
    return scores.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
