"""Roll chunk-level topic labels up to per-document distributions.

Spark-native version of /root/reference/src/topic_modeling/rollup.rs:

- proportions over ALL of a document's chunks (outlier mass included)
  sum to 1 (rollup.rs:9-13,52-86);
- distribution emitted in ascending topic-id order;
- ``dominant_topic`` = most frequent NON-outlier label, ties to the
  smaller id; all-outlier/no-chunk docs -> -1 (rollup.rs:87-99);
- per-corpus soft sizes drop outlier mass (rollup.rs:110-132).

Shape: groupBy(row_id, label).count -> window proportions ->
collect_list(struct) sorted by topic id; dominant via one ranked
window. Two shuffles on row_id, both combiner-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_text_spark.operators.topic_modeling.cluster import OUTLIER_LABEL

__all__ = ["corpus_topic_sizes", "rollup"]


def rollup(
    labeled_chunks: DataFrame,
    *,
    row_id_col: str = "__row_id",
    label_col: str = "label",
) -> DataFrame:
    """``DataFrame[row_id, topic_distribution, dominant_topic]`` — one
    row per document that HAS chunks (zero-chunk docs are absent and
    get the -1/empty defaults at join-back)."""
    counts = labeled_chunks.groupBy(row_id_col, label_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = Window.partitionBy(row_id_col)
    with_prop = counts.withColumn(
        "proportion",
        (F.col("cnt") / F.sum("cnt").over(per_doc)).cast("float"),
    )
    # array_sort on struct(topic_id, ...) sorts by topic_id ascending —
    # the reference's BTreeMap ordering.
    dist = with_prop.groupBy(row_id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(label_col).cast("int").alias("topic_id"),
                    F.col("proportion"),
                )
            )
        ).alias("topic_distribution")
    )
    dominant_w = Window.partitionBy(row_id_col).orderBy(
        F.col("cnt").desc(), F.col(label_col).asc()
    )
    dominant = (
        with_prop.filter(F.col(label_col) != OUTLIER_LABEL)
        .withColumn("__rn", F.row_number().over(dominant_w))
        .filter(F.col("__rn") == 1)
        .select(row_id_col, F.col(label_col).cast("int").alias("dominant_topic"))
    )
    return dist.join(dominant, row_id_col, "left").withColumn(
        "dominant_topic",
        F.coalesce(F.col("dominant_topic"), F.lit(OUTLIER_LABEL)),
    )


def corpus_topic_sizes(
    doc_topics: DataFrame,
    *,
    corpus_col: str,
    dist_col: str = "topic_distribution",
) -> DataFrame:
    """Per-corpus, per-topic soft sizes (sum of document proportions,
    outliers dropped — rollup.rs:110-132)."""
    exploded = doc_topics.select(
        F.col(corpus_col).alias("corpus"), F.explode(dist_col).alias("tp")
    ).filter(F.col("tp.topic_id") != OUTLIER_LABEL)
    return exploded.groupBy("corpus", F.col("tp.topic_id").alias("topic_id")).agg(
        F.sum("tp.proportion").cast("float").alias("soft_size")
    )
