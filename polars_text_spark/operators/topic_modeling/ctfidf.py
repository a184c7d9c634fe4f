"""c-TF-IDF topic labeling.

Formula (BERTopic's ClassTfidfTransformer, as implemented at
/root/reference/src/topic_modeling/ctfidf.rs:10-17,55-105):

    tf(t, c) = count(t in c) / total_words(c)
    idf(t)   = ln(1 + A / f(t))    A = avg words/topic, f(t) = corpus freq
    score    = tf * idf

Top-k per topic, highest score first, alphabetical tie-break
(ctfidf.rs:96-102).

Two implementations: :func:`ctfidf_scores` is the pure-Python
deterministic core (unit-testable against the reference's golden
cases); :func:`topic_words` is the distributed version — explode
tokens -> groupBy(topic, token) -> corpus/topic totals via window
sums -> score -> ranked window truncation. Fully Spark-native, no
driver materialization, which is what makes the stage viable when
topics hold millions of chunks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_text_spark.functions.tokenize import tokenize

__all__ = ["ctfidf_scores", "topic_words"]


def ctfidf_scores(
    per_topic_counts: list[dict[str, int]], top_k: int = 10
) -> list[list[tuple[str, float]]]:
    """Pure-python c-TF-IDF (mirrors ctfidf.rs:55-105)."""
    n_topics = len(per_topic_counts)
    if n_topics == 0:
        return []
    words_per_topic = [sum(counts.values()) for counts in per_topic_counts]
    avg_words = sum(words_per_topic) / n_topics
    corpus_freq: dict[str, int] = {}
    for counts in per_topic_counts:
        for term, c in counts.items():
            corpus_freq[term] = corpus_freq.get(term, 0) + c
    out: list[list[tuple[str, float]]] = []
    for counts, words in zip(per_topic_counts, words_per_topic):
        if words == 0:
            out.append([])
            continue
        scored = [
            (term, (c / words) * math.log(1.0 + avg_words / corpus_freq[term]))
            for term, c in counts.items()
        ]
        scored.sort(key=lambda ts: (-ts[1], ts[0]))
        out.append(scored[:top_k])
    return out


def topic_words(
    labeled_chunks: DataFrame,
    *,
    label_col: str = "label",
    text_col: str = "chunk_text",
    vectorizer_model: str = "native:plain_words_en",
    lowercase: bool = True,
    stopwords: list[str] | None = None,
    top_k: int = 10,
) -> DataFrame:
    """Distributed c-TF-IDF: ``DataFrame[label, representative_words]``.

    Input: one row per chunk with its topic label (outliers already
    filtered). The reference concatenates member chunks per topic
    (mod.rs:308-317) before counting; counting tokens per (topic,
    token) directly is the same math without building giant strings.
    """
    toks = labeled_chunks.select(
        F.col(label_col).alias("label"),
        F.explode(
            tokenize(text_col, model=vectorizer_model, lowercase=lowercase)
        ).alias("t"),
    ).select("label", F.col("t.token").alias("token"))
    if stopwords:
        toks = toks.filter(~F.col("token").isin(*stopwords))

    counts = toks.groupBy("label", "token").agg(F.count(F.lit(1)).alias("cnt"))
    # A (avg words/topic) is a 1-row aggregate broadcast to every row —
    # no single-reducer global window at scale.
    totals = counts.agg(
        (F.sum("cnt") / F.countDistinct("label")).alias("avg_words")
    )
    scored = (
        counts.withColumn(
            "topic_words_total", F.sum("cnt").over(Window.partitionBy("label"))
        )
        .withColumn("corpus_freq", F.sum("cnt").over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "score",
            (F.col("cnt") / F.col("topic_words_total"))
            * F.log(F.lit(1.0) + F.col("avg_words") / F.col("corpus_freq")),
        )
    )
    ranked = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("label").orderBy(
                F.col("score").desc(), F.col("token").asc()
            )
        ),
    ).filter(F.col("rn") <= top_k)
    return ranked.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct("rn", "token"))
        ).alias("__ranked")
    ).select(
        "label",
        F.transform(F.col("__ranked"), lambda s: s["token"]).alias(
            "representative_words"
        ),
    )
