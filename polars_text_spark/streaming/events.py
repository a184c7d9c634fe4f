"""Event-stream operators (Structured Streaming).

``readStream`` -> watermarked event-time windows -> ``writeStream``.
Tested via the file source over a directory of parquet drops (the
exact shape a 100 TB ingest uses: object-store prefixes + trigger
intervals); the batch DataFrame versions of the same transforms are
what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "windowed_event_counts",
    "windowed_key_counts",
    "topk_per_window",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source stream over a directory of parquet event drops."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-type event counts + value sums over event-time windows.

    Works identically on a batch or streaming DataFrame; on a stream the
    watermark bounds state for late data. Output columns are stable and
    SQL-oracle-checkable in the batch case.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def windowed_key_counts(
    events: DataFrame,
    key,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window counts of an arbitrary key expression — the
    state-bounded half of a "trending items" pipeline.

    ``key`` is a column name or Column (e.g. a ``get_json_object``
    extraction); output is ``(window_start, key, n_events)``. Works on
    batch and streaming frames alike; on a stream the watermark bounds
    the per-window state and late rows beyond it are dropped.

    The RANKING half (:func:`topk_per_window`) is deliberately a
    separate batch-side function: ranking window functions aren't
    supported inside a streaming aggregation, and at scale that's the
    right split anyway — the stream maintains mergeable counts, the
    cheap top-k runs in ``foreachBatch`` or the serving layer over the
    (windows x keys)-sized count table.
    """
    k = F.col(key) if isinstance(key, str) else key
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), k.alias("key"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "key", "n_events")
    )


def topk_per_window(counts: DataFrame, *, k: int = 5) -> DataFrame:
    """Rank :func:`windowed_key_counts` output within each window:
    keep the top-``k`` keys by ``(n_events desc, key asc)`` — the
    deterministic tie-break. Batch-side (use via ``foreachBatch`` on a
    stream); the window partitioning keeps the sort local to each
    window's key set."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("key").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
