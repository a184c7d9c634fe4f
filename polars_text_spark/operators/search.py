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

__all__ = ["bm25_scores", "bm25_topk", "tfidf_keywords"]


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


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    min_df: int = 1,
    decimals: int = 6,
) -> DataFrame:
    """Per-document keyword extraction: the top-``k`` whitespace terms
    by smoothed TF-IDF. Returns ``(id_col, term, tf, df, tfidf, rank)``
    with ``tfidf = tf * (ln((N + 1) / (df + 1)) + 1)`` (sklearn's
    smooth-idf — never negative, never divides by zero) rounded to
    ``decimals``; ``rank`` orders by the ROUNDED score then term
    (engine-stable: ordering on the raw float could flip on a last-ulp
    ln() difference between engines).

    Scale shape: explode -> per-(doc, term) counts (one combiner-heavy
    shuffle), document frequencies from the same aggregate stream
    grouped by term (vocabulary-sized), N as a 1-row broadcast; the
    final per-doc top-k window shuffles on the doc id. No UDFs,
    whole-stage codegen throughout. ``min_df`` drops hapax noise
    before the window.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(_ws_tokens(F.col(text_col))).alias("term")
    )
    tf = base.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n = docs.filter(F.col(text_col).isNotNull()).agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    scored = (
        tf.join(dfreq.filter(F.col("df") >= min_df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                ),
                decimals,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col, "term", "tf", "df", "tfidf",
            F.col("rank").cast("int").alias("rank"),
        )
    )
