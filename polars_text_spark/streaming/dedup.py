"""Streaming document deduplication (Structured Streaming).

A 100 TB ingest arrives as a stream of document drops; exact dedup
must happen online, not in a nightly batch. Spark's streaming
``dropDuplicatesWithinWatermark`` keeps one row per content
fingerprint while the watermark bounds the dedup state — without it,
state grows with corpus size and the job eventually OOMs.

The fingerprint is the same sha2-over-clean_text key the batch
operator uses (operators/dedup.py, functions/analysis.py
doc_fingerprint), so the streaming output is row-compatible with the
batch path and the stream==batch equivalence is testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_text_spark.functions.analysis import doc_fingerprint

__all__ = ["DOCS_STREAM_SCHEMA", "read_docs_stream", "dedup_stream"]

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ]
)


def read_docs_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source stream over a directory of parquet document drops."""
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def dedup_stream(
    docs: DataFrame,
    *,
    watermark: str = "1 hour",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Keep the first-seen document per content fingerprint.

    Streaming: ``withWatermark`` + ``dropDuplicatesWithinWatermark``
    on the fingerprint — state for a fingerprint is dropped once the
    watermark passes it, so memory is bounded by the dedup horizon,
    not the corpus. Batch DataFrames take the deterministic
    min-doc_id keeper path instead (same row-level semantics as
    operators/dedup.exact_dedup), so the same call is oracle- and
    twin-testable.
    """
    with_fp = docs.filter(F.col("text").isNotNull()).withColumn(
        "fingerprint", doc_fingerprint("text")
    )
    if docs.isStreaming:
        return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    return (
        with_fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
