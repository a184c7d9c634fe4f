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

__all__ = ["EVENTS_SCHEMA", "read_events_stream", "windowed_event_counts"]

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
