"""Topic-modeling orchestrator: DataFrame in, DataFrame out (1:1).

The Spark redesign of the reference's whole-column plugin
(/root/reference/src/topic_modeling/mod.rs:209-399, SURVEY.md §3-C):

1. stable ``__row_id`` (join key only, never an ordinal) — replaces
   the reference's positional alignment (plugin.rs:158-160);
2. chunking + embedding run distributed (pandas UDFs over Arrow);
3. the (n_chunks x dim) embedding matrix is collected to the driver
   for reduction + density clustering — the documented scale ceiling,
   equivalent to the reference's single-process ceiling (~1e6 chunks
   at 384-dim; sample above that);
4. chunk labels ship back as a DataFrame; c-TF-IDF, rollup and
   coordinates are Spark aggregations;
5. everything joins back on ``__row_id``, preserving input rows 1:1 —
   topic metadata is replicated per row so
   ``groupBy(topics.dominant_topic)`` recovers the topic table
   (plugin.rs:10-28).

Guards replicated from mod.rs:263-267: ``n_chunks == 0`` -> zero
topics, every row dominant -1; ``0 < n_chunks < 12`` -> skip
reduce+cluster, single trivial topic, coord (0, 0).

``stage_timings_ms`` uses the reference's stage names
(mod.rs:146-175). Spark stages are lazy; their timings measure driver
orchestration (plan build + any forcing action noted below), with the
heavy distributed work accounted to the stage that forces it.
"""

from __future__ import annotations

import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_text_spark.functions.embedding import FEATURE_HASH_MODEL, embedding
from polars_text_spark.operators.topic_modeling.chunking import chunk_document
from polars_text_spark.operators.topic_modeling.cluster import (
    OUTLIER_LABEL,
    assign_to_clusters,
    cluster,
)
from polars_text_spark.operators.topic_modeling.coords import topic_coords_2d
from polars_text_spark.operators.topic_modeling.ctfidf import topic_words
from polars_text_spark.operators.topic_modeling.reduce import (
    MIN_POINTS_FOR_REDUCTION,
    reduce_embeddings,
    reduce_with_sampled_fit,
)
from polars_text_spark.operators.topic_modeling.rollup import rollup

__all__ = ["TOPIC_STRUCT_TYPE", "topic_modeling"]

_ROW_ID = "__row_id"

DIST_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("topic_id", T.IntegerType(), False),
            T.StructField("proportion", T.FloatType(), False),
        ]
    )
)

TOPIC_STRUCT_TYPE = T.StructType(
    [
        T.StructField("dominant_topic", T.IntegerType(), False),
        T.StructField("topic_distribution", DIST_TYPE, False),
        T.StructField("representative_words", T.ArrayType(T.StringType()), False),
        T.StructField("x", T.FloatType(), False),
        T.StructField("y", T.FloatType(), False),
        # UInt32 in the reference; Spark has no unsigned ints
        # (documented deviation, SURVEY.md §1.2).
        T.StructField("n_topics", T.IntegerType(), False),
        T.StructField("n_chunks", T.IntegerType(), False),
        T.StructField(
            "stage_timings_ms",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("stage", T.StringType(), False),
                        T.StructField("elapsed_ms", T.DoubleType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


def _chunk_udf(max_tokens: int, overlap: int):
    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield series.map(
                lambda text: chunk_document(
                    text, max_tokens=max_tokens, overlap=overlap
                )
            )

    return F.pandas_udf(fn, T.ArrayType(T.StringType(), containsNull=False))


class _Timings:
    def __init__(self) -> None:
        self.stages: list[tuple[str, float]] = []
        self._t0 = time.perf_counter()
        self._last = self._t0

    def mark(self, stage: str) -> None:
        now = time.perf_counter()
        self.stages.append((stage, (now - self._last) * 1000.0))
        self._last = now

    def finish(self) -> list[tuple[str, float]]:
        self.stages.append(("total", (time.perf_counter() - self._t0) * 1000.0))
        return self.stages


def topic_modeling(
    df: DataFrame,
    text_col: str = "text",
    *,
    embedder_model: str | None = None,
    max_tokens: int = 256,
    overlap: int = 32,
    reduce_dims: int = 5,
    seed: int = 42,
    min_cluster_size: int = 10,
    min_samples: int | None = None,
    top_k: int = 10,
    vectorizer_model: str | None = None,
    lowercase: bool = True,
    stopwords: list[str] | None = None,
    max_fit_points: int = 50_000,
    output_col: str = "topics",
) -> DataFrame:
    """Cluster a document column into topics; returns the input
    DataFrame + one struct column (schema :data:`TOPIC_STRUCT_TYPE`),
    rows 1:1 with the input."""
    if max_tokens <= 0:
        raise ValueError("chunking max_tokens must be > 0")
    if overlap >= max_tokens:
        raise ValueError("overlap must be strictly less than max_tokens")
    spark = df.sparkSession
    timings = _Timings()
    model = embedder_model or f"{FEATURE_HASH_MODEL}:64"
    timings.mark("embedder_load")  # registry load happens lazily per worker

    # Stable row ids: persist so every downstream branch sees the same
    # id assignment (monotonically_increasing_id depends on partition
    # layout, so the frame must be pinned once — the embedding collect
    # below is the materializing action for both caches).
    source = df.withColumn(_ROW_ID, F.monotonically_increasing_id()).persist()

    chunks = (
        source.select(
            _ROW_ID,
            F.posexplode(_chunk_udf(max_tokens, overlap)(F.col(text_col))).alias(
                "chunk_index", "chunk_text"
            ),
        )
    ).persist()
    timings.mark("chunking")

    # One action materializes source+chunks AND returns the matrix —
    # no separate count() jobs.
    embedded = chunks.select(
        _ROW_ID,
        "chunk_index",
        embedding("chunk_text", embedder_model=model).alias("vec"),
    ).collect()
    n_chunks = len(embedded)

    if n_chunks == 0:
        labels = np.empty(0, dtype=np.int32)
        n_topics = 0
        coords: list[tuple[float, float]] = []
        labeled = None
        timings.mark("embedding")
        timings.mark("reduce_clustering")
        timings.mark("hdbscan")
        timings.mark("reduce_coordinates")
        timings.mark("topic_coordinates")
    else:
        # Deterministic chunk order for the driver-side matrix.
        embedded.sort(key=lambda r: (r[_ROW_ID], r["chunk_index"]))
        matrix = np.array([r["vec"] for r in embedded], dtype=np.float32)
        timings.mark("embedding")

        if n_chunks < MIN_POINTS_FOR_REDUCTION:
            # mod.rs:263-267: too few points to reduce/cluster — one
            # trivial topic at the origin.
            labels = np.zeros(n_chunks, dtype=np.int32)
            n_topics = 1
            coords = [(0.0, 0.0)]
            timings.mark("reduce_clustering")
            timings.mark("hdbscan")
            timings.mark("reduce_coordinates")
            timings.mark("topic_coordinates")
        elif n_chunks <= max_fit_points:
            reduced = reduce_embeddings(matrix, dims=reduce_dims, seed=seed)
            timings.mark("reduce_clustering")
            labels, n_topics = cluster(
                reduced,
                min_cluster_size=min_cluster_size,
                min_samples=min_samples,
            )
            timings.mark("hdbscan")
            points_2d = reduce_embeddings(matrix, dims=2, seed=seed)
            timings.mark("reduce_coordinates")
            coords = topic_coords_2d(points_2d, labels, n_topics)
            timings.mark("topic_coordinates")
        else:
            # Sampled-fit scale path (SCALING.md): fit reduce+cluster on
            # a seeded uniform sample, project everything, and extend
            # labels by nearest-centroid with a noise radius.
            rng = np.random.default_rng(seed)
            fit_idx = np.sort(
                rng.choice(n_chunks, max_fit_points, replace=False)
            )
            reduced = reduce_with_sampled_fit(
                matrix, fit_idx, dims=reduce_dims, seed=seed
            )
            timings.mark("reduce_clustering")
            fit_labels, n_topics = cluster(
                reduced[fit_idx],
                min_cluster_size=min_cluster_size,
                min_samples=min_samples,
            )
            labels = assign_to_clusters(reduced, fit_idx, fit_labels, n_topics)
            timings.mark("hdbscan")
            points_2d = reduce_with_sampled_fit(matrix, fit_idx, dims=2, seed=seed)
            timings.mark("reduce_coordinates")
            coords = topic_coords_2d(points_2d, labels, n_topics)
            timings.mark("topic_coordinates")

        label_rows = [
            (int(r[_ROW_ID]), int(r["chunk_index"]), int(label))
            for r, label in zip(embedded, labels)
        ]
        label_df = spark.createDataFrame(
            label_rows,
            T.StructType(
                [
                    T.StructField(_ROW_ID, T.LongType(), False),
                    T.StructField("chunk_index", T.IntegerType(), False),
                    T.StructField("label", T.IntegerType(), False),
                ]
            ),
        )
        labeled = chunks.join(F.broadcast(label_df), [_ROW_ID, "chunk_index"])

    # Topic table: representative words + 2D coords per topic id.
    if labeled is not None and n_topics > 0:
        words_df = topic_words(
            labeled.filter(F.col("label") != OUTLIER_LABEL),
            vectorizer_model=vectorizer_model or "native:plain_words_en",
            lowercase=lowercase,
            stopwords=stopwords,
            top_k=top_k,
        )
        timings.mark("ctfidf_count_terms")
        coords_df = spark.createDataFrame(
            [(t, float(x), float(y)) for t, (x, y) in enumerate(coords)],
            T.StructType(
                [
                    T.StructField("label", T.IntegerType(), False),
                    T.StructField("topic_x", T.FloatType(), False),
                    T.StructField("topic_y", T.FloatType(), False),
                ]
            ),
        )
        topic_table = coords_df.join(words_df, "label", "left").select(
            F.col("label").alias("dominant_topic"),
            F.coalesce(
                "representative_words", F.array().cast("array<string>")
            ).alias("representative_words"),
            "topic_x",
            "topic_y",
        )
        timings.mark("ctfidf_scores")
    else:
        topic_table = None
        timings.mark("ctfidf_count_terms")
        timings.mark("ctfidf_scores")

    if labeled is not None:
        doc_topics = rollup(labeled, row_id_col=_ROW_ID, label_col="label")
    else:
        doc_topics = None
    timings.mark("rollup")

    out = source
    if doc_topics is not None:
        out = out.join(doc_topics, _ROW_ID, "left")
    else:
        out = out.withColumn("topic_distribution", F.lit(None).cast(DIST_TYPE))
        out = out.withColumn("dominant_topic", F.lit(None).cast("int"))
    if topic_table is not None:
        out = out.join(F.broadcast(topic_table), "dominant_topic", "left")
    else:
        out = out.withColumn(
            "representative_words", F.lit(None).cast("array<string>")
        )
        out = out.withColumn("topic_x", F.lit(None).cast("float"))
        out = out.withColumn("topic_y", F.lit(None).cast("float"))

    timings.mark("assemble_topics")
    stage_list = timings.finish()
    timings_lit = F.array(
        *[
            F.struct(
                F.lit(stage).alias("stage"),
                F.lit(float(ms)).alias("elapsed_ms"),
            )
            for stage, ms in stage_list
        ]
    )
    # Outlier/zero-chunk rows: dominant -1, empty distribution/words,
    # origin coords (plugin.rs:160-186).
    struct_col = F.struct(
        F.coalesce("dominant_topic", F.lit(OUTLIER_LABEL)).cast("int").alias(
            "dominant_topic"
        ),
        F.coalesce("topic_distribution", F.array().cast(DIST_TYPE)).alias(
            "topic_distribution"
        ),
        F.coalesce("representative_words", F.array().cast("array<string>")).alias(
            "representative_words"
        ),
        F.coalesce("topic_x", F.lit(0.0)).cast("float").alias("x"),
        F.coalesce("topic_y", F.lit(0.0)).cast("float").alias("y"),
        F.lit(int(n_topics)).cast("int").alias("n_topics"),
        F.lit(int(n_chunks)).cast("int").alias("n_chunks"),
        timings_lit.alias("stage_timings_ms"),
    )
    result = out.withColumn(output_col, struct_col).select(
        *df.columns, output_col
    )
    return result
