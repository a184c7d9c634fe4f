"""Topic-modeling orchestrator: DataFrame in, DataFrame out (1:1).

The Spark redesign of the reference's whole-column plugin
(/root/reference/src/topic_modeling/mod.rs:209-399, SURVEY.md §3-C):

1. stable ``__row_id`` (join key only, never an ordinal) — replaces
   the reference's positional alignment (plugin.rs:158-160);
2. chunking + embedding run distributed (pandas UDFs over Arrow);
3. driver-side materialization is BOUNDED by ``max_fit_points``:
   - ``n_chunks <= max_fit_points``: the (n x dim) matrix moves via
     Arrow (``toPandas``), reduce + density-cluster exactly as the
     reference does in one process;
   - above that: only a seeded Bernoulli SAMPLE of ``max_fit_points``
     vectors is collected; reduce + cluster fit on the sample, and the
     fitted projection + topic centroids/radii ship to executors in a
     pandas-UDF closure that assigns every chunk its label and 2D
     coordinate DISTRIBUTED — the full matrix never lands driver-side;
4. chunk labels live in a DataFrame; c-TF-IDF, rollup, and (on the
   sampled path) topic coordinates are Spark aggregations;
5. everything joins back on ``__row_id``, preserving input rows 1:1 —
   topic metadata is replicated per row so
   ``groupBy(topics.dominant_topic)`` recovers the topic table
   (plugin.rs:10-28).

Guards replicated from mod.rs:263-267: ``n_chunks == 0`` -> zero
topics, every row dominant -1; ``0 < n_chunks < 12`` -> skip
reduce+cluster, single trivial topic, coord (0, 0).

Sampled-path deviation note: the distributed out-of-sample projection
is the seeded linear (PCA) projector fitted on the sample — PaCMAP
(used below ``max_fit_points`` when installed) has no broadcastable
parametric transform (its out-of-sample path needs the fitted neighbor
index, which is not picklable). The reference has no equivalent path
at all (single-process ceiling, reduce.rs:5-8).

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
    cluster,
    cluster_geometry,
    nearest_centroid_labels,
)
from polars_text_spark.operators.topic_modeling.coords import topic_coords_2d
from polars_text_spark.operators.topic_modeling.ctfidf import topic_words
from polars_text_spark.operators.topic_modeling.reduce import (
    MIN_POINTS_FOR_REDUCTION,
    LinearProjector,
    fit_linear_projector,
    reduce_embeddings,
)
from polars_text_spark.operators.topic_modeling.rollup import rollup
from polars_text_spark.persist import track_persist

__all__ = ["TOPIC_STRUCT_TYPE", "assemble_topics", "topic_modeling"]

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

_LABEL_SCHEMA = T.StructType(
    [
        T.StructField(_ROW_ID, T.LongType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

_COORDS_SCHEMA = T.StructType(
    [
        T.StructField("label", T.IntegerType(), False),
        T.StructField("topic_x", T.FloatType(), False),
        T.StructField("topic_y", T.FloatType(), False),
    ]
)

_ASSIGN_TYPE = T.StructType(
    [
        T.StructField("label", T.IntegerType(), False),
        T.StructField("x2", T.FloatType(), False),
        T.StructField("y2", T.FloatType(), False),
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


def _collect_vectors(df: DataFrame) -> pd.DataFrame:
    """Arrow-batched driver collect of ``(__row_id, chunk_index, vec)``
    in deterministic (row_id, chunk_index) order — the ONLY driver-side
    materialization in the pipeline; every caller bounds its row count
    by ``max_fit_points`` (plus sampling slack)."""
    pdf = df.toPandas()
    return pdf.sort_values([_ROW_ID, "chunk_index"], ignore_index=True)


def _stack(vec_series: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float32) for v in vec_series])


def _assign_udf(
    proj_k: LinearProjector,
    proj_2: LinearProjector,
    centroids: np.ndarray,
    radii: np.ndarray,
    radius_slack: float = 1.5,
):
    """pandas UDF: embedding vector -> (label, x2, y2), all batched
    numpy. The closure ships only the fitted projector matrices
    (dims x d) and topic geometry (n_topics x dims) — kilobytes, the
    broadcast-instead-of-collect half of the sampled-fit design."""

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in batches:
            if len(series) == 0:
                yield pd.DataFrame(
                    {
                        "label": pd.Series([], dtype="int32"),
                        "x2": pd.Series([], dtype="float32"),
                        "y2": pd.Series([], dtype="float32"),
                    }
                )
                continue
            mat = _stack(series)
            reduced = proj_k.transform(mat)
            labels = nearest_centroid_labels(
                reduced, centroids, radii, radius_slack=radius_slack
            )
            xy = proj_2.transform(mat)
            yield pd.DataFrame(
                {"label": labels, "x2": xy[:, 0], "y2": xy[:, 1]}
            )

    return F.pandas_udf(fn, _ASSIGN_TYPE)


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
    rows 1:1 with the input.

    Persisted intermediates are registered with
    :mod:`polars_text_spark.persist`; call ``release_tracked()`` after
    the result's FINAL consuming action (row ids must not recompute)."""
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
    # layout, so the frame must be pinned once — the count below is the
    # materializing action for both caches).
    source = track_persist(
        df.withColumn(_ROW_ID, F.monotonically_increasing_id()).persist()
    )

    embedded = track_persist(
        source.select(
            _ROW_ID,
            F.posexplode(_chunk_udf(max_tokens, overlap)(F.col(text_col))).alias(
                "chunk_index", "chunk_text"
            ),
        )
        .withColumn("vec", embedding("chunk_text", embedder_model=model))
        .persist()
    )
    timings.mark("chunking")

    # One count materializes source+embedded; chunk texts and vectors
    # stay cached EXECUTOR-side — nothing is collected here.
    n_chunks = embedded.count()
    timings.mark("embedding")

    labeled: DataFrame | None = None
    coords_df: DataFrame | None = None
    coords: list[tuple[float, float]] = []
    n_topics = 0

    if n_chunks == 0:
        for stage in (
            "reduce_clustering",
            "hdbscan",
            "reduce_coordinates",
            "topic_coordinates",
        ):
            timings.mark(stage)
    elif n_chunks < MIN_POINTS_FOR_REDUCTION:
        # mod.rs:263-267: too few points to reduce/cluster — one
        # trivial topic at the origin; no driver materialization at all.
        labeled = embedded.select(
            _ROW_ID, "chunk_index", "chunk_text", F.lit(0).cast("int").alias("label")
        )
        n_topics = 1
        coords = [(0.0, 0.0)]
        for stage in (
            "reduce_clustering",
            "hdbscan",
            "reduce_coordinates",
            "topic_coordinates",
        ):
            timings.mark(stage)
    elif n_chunks <= max_fit_points:
        # Exact path: the whole matrix fits the documented driver
        # budget; move it ONCE via Arrow.
        pdf = _collect_vectors(embedded.select(_ROW_ID, "chunk_index", "vec"))
        matrix = _stack(pdf["vec"])
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
        label_df = spark.createDataFrame(
            pd.DataFrame(
                {
                    _ROW_ID: pdf[_ROW_ID].astype("int64"),
                    "chunk_index": pdf["chunk_index"].astype("int32"),
                    "label": labels.astype("int32"),
                }
            ),
            _LABEL_SCHEMA,
        )
        labeled = embedded.join(
            F.broadcast(label_df), [_ROW_ID, "chunk_index"]
        ).select(_ROW_ID, "chunk_index", "chunk_text", "label")
    else:
        # Sampled-fit scale path (SCALING.md): fit reduce+cluster on a
        # seeded cross-partition Bernoulli sample; broadcast the fitted
        # projection + topic geometry and assign every chunk its label
        # and 2D coordinate in a pandas UDF — the full matrix never
        # lands driver-side.
        frac = min(1.0, (1.3 * max_fit_points) / n_chunks)
        fit_pdf = _collect_vectors(
            embedded.select(_ROW_ID, "chunk_index", "vec").sample(
                fraction=frac, seed=seed
            )
        )
        if len(fit_pdf) > max_fit_points:
            # limit() would re-bias toward early partitions; trim with
            # a seeded driver-side draw instead (order preserved).
            rng = np.random.default_rng(seed)
            keep = np.sort(
                rng.choice(len(fit_pdf), max_fit_points, replace=False)
            )
            fit_pdf = fit_pdf.iloc[keep].reset_index(drop=True)
        fit_matrix = _stack(fit_pdf["vec"])
        dims = max(1, min(reduce_dims, fit_matrix.shape[1], len(fit_matrix) - 1))
        proj_k = fit_linear_projector(fit_matrix, dims)
        reduced_fit = proj_k.transform(fit_matrix)
        timings.mark("reduce_clustering")
        fit_labels, n_topics = cluster(
            reduced_fit,
            min_cluster_size=min_cluster_size,
            min_samples=min_samples,
        )
        if n_topics > 0:
            centroids, radii = cluster_geometry(
                reduced_fit, fit_labels, n_topics
            )
        else:
            centroids = np.zeros((0, reduced_fit.shape[1]), dtype=np.float32)
            radii = np.zeros(0, dtype=np.float32)
        timings.mark("hdbscan")
        proj_2 = fit_linear_projector(fit_matrix, 2)
        timings.mark("reduce_coordinates")

        # Fit chunks keep their exact fit labels (broadcast join on the
        # <=max_fit_points sample); everything else gets
        # nearest-centroid-with-radius from the UDF.
        fit_label_df = spark.createDataFrame(
            pd.DataFrame(
                {
                    _ROW_ID: fit_pdf[_ROW_ID].astype("int64"),
                    "chunk_index": fit_pdf["chunk_index"].astype("int32"),
                    "label": fit_labels.astype("int32"),
                }
            ),
            _LABEL_SCHEMA,
        ).withColumnRenamed("label", "__fit_label")
        assigned = embedded.withColumn(
            "__as", _assign_udf(proj_k, proj_2, centroids, radii)(F.col("vec"))
        )
        labeled = assigned.join(
            F.broadcast(fit_label_df), [_ROW_ID, "chunk_index"], "left"
        ).select(
            _ROW_ID,
            "chunk_index",
            "chunk_text",
            F.coalesce("__fit_label", F.col("__as.label"))
            .cast("int")
            .alias("label"),
            F.col("__as.x2").alias("__x2"),
            F.col("__as.y2").alias("__y2"),
        )
        if n_topics > 0:
            # Topic coords = centroid of member chunks' 2D coords
            # (coords.rs:31-59) — a Spark aggregation here, since the
            # 2D points stay distributed; memberless topics at origin.
            agg = (
                labeled.filter(F.col("label") != OUTLIER_LABEL)
                .groupBy("label")
                .agg(F.avg("__x2").alias("cx"), F.avg("__y2").alias("cy"))
            )
            base = spark.createDataFrame(
                [(t,) for t in range(n_topics)],
                T.StructType([T.StructField("label", T.IntegerType(), False)]),
            )
            coords_df = base.join(F.broadcast(agg), "label", "left").select(
                "label",
                F.coalesce("cx", F.lit(0.0)).cast("float").alias("topic_x"),
                F.coalesce("cy", F.lit(0.0)).cast("float").alias("topic_y"),
            )
        timings.mark("topic_coordinates")

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
        if coords_df is None:
            coords_df = spark.createDataFrame(
                [(t, float(x), float(y)) for t, (x, y) in enumerate(coords)],
                _COORDS_SCHEMA,
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

    # build the assemble joins BEFORE marking the stage so the timing
    # still covers the join-plan construction (only the struct literal,
    # which needs the finished timings, comes after)
    joined = _assemble_joined(
        source, doc_topics, topic_table, row_id_col=_ROW_ID
    )
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
    return _assemble_struct(
        joined,
        n_topics=n_topics,
        n_chunks=n_chunks,
        keep_cols=list(df.columns),
        output_col=output_col,
        timings_col=timings_lit,
    )


_TIMINGS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("stage", T.StringType(), False),
            T.StructField("elapsed_ms", T.DoubleType(), False),
        ]
    ),
    containsNull=False,
)


def assemble_topics(
    source: DataFrame,
    doc_topics: DataFrame | None,
    topic_table: DataFrame | None,
    *,
    row_id_col: str,
    n_topics: int,
    n_chunks: int,
    keep_cols: list[str],
    output_col: str = "topics",
    timings_col=None,
) -> DataFrame:
    """The assemble stage (/root/reference/src/topic_modeling/
    plugin.rs:136-293) as a standalone operator: join the per-row
    rollup (``doc_topics``, keyed by ``row_id_col``) and the broadcast
    per-topic metadata table (``topic_table``: ``(dominant_topic,
    representative_words, topic_x, topic_y)``) back onto ``source``,
    1:1 with the input rows, filling outlier/zero-chunk rows with
    dominant -1, empty distribution/words, and origin coords
    (plugin.rs:160-186).

    Scale shape: one left equi-join on the row id plus one broadcast
    join on the (|topics|-row) metadata — no extra shuffle of the
    source beyond the rollup key."""
    joined = _assemble_joined(
        source, doc_topics, topic_table, row_id_col=row_id_col
    )
    return _assemble_struct(
        joined,
        n_topics=n_topics,
        n_chunks=n_chunks,
        keep_cols=keep_cols,
        output_col=output_col,
        timings_col=timings_col,
    )


def _assemble_joined(
    source: DataFrame,
    doc_topics: DataFrame | None,
    topic_table: DataFrame | None,
    *,
    row_id_col: str,
) -> DataFrame:
    out = source
    if doc_topics is not None:
        out = out.join(doc_topics, row_id_col, "left")
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
    return out


def _assemble_struct(
    out: DataFrame,
    *,
    n_topics: int,
    n_chunks: int,
    keep_cols: list[str],
    output_col: str,
    timings_col=None,
) -> DataFrame:
    if timings_col is None:
        timings_col = F.array().cast(_TIMINGS_TYPE)
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
        timings_col.alias("stage_timings_ms"),
    )
    return out.withColumn(output_col, struct_col).select(
        *keep_cols, output_col
    )
