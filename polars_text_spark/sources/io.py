"""Corpus ingestion formats beyond parquet: JSONL, CSV, text-per-file.

The reference rides polars' readers (read_parquet/read_csv/read_ndjson
— whatever the host engine loads); a user switching here brings
corpora in the LLM-pipeline lingua franca (gzipped JSONL), spreadsheet
exports (CSV), or one-file-per-document trees. These wrappers pin the
scale-relevant knobs:

- **Explicit schemas, never inference.** Schema inference is a full
  extra pass over the data — at 100 TB that's a second 100 TB scan
  before the first real job. Every reader takes (or defaults) a
  schema; the docs-shaped default matches the testdata contract.
- **Corrupt-record capture, not job failure.** Real crawls contain
  malformed lines; PERMISSIVE mode + a ``_corrupt_record`` column
  turns them into auditable rows (count them, don't die at hour 9).
- **Compression transparency.** Spark's text/json/csv sources handle
  ``.gz``/``.zst``/``.bz2`` per file automatically; note that gzip is
  NOT splittable — one task per .gz file, so shard source files at
  ~100-500 MB for parallelism (the standard JSONL-corpus layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "DOCS_SCHEMA",
    "read_jsonl",
    "read_csv_docs",
    "read_text_tree",
    "write_jsonl",
]

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    *,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON documents.

    With ``keep_corrupt`` (default) malformed lines land in
    ``_corrupt_record`` instead of failing the job; filter
    ``F.col('_corrupt_record').isNotNull()`` for the reject audit.
    Spark disallows queries that touch ONLY the corrupt column on the
    raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — ``.persist()`` (or
    write out) the parsed frame before running the audit.
    """
    s = schema if schema is not None else DOCS_SCHEMA
    if keep_corrupt:
        # PERMISSIVE + audit column: malformed lines become rows
        if CORRUPT_COL not in [f.name for f in s.fields]:
            s = T.StructType(
                list(s.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
            )
        reader = (
            spark.read.schema(s)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
    else:
        # opting out of the audit must DROP malformed lines — PERMISSIVE
        # without the column would silently turn them into all-null rows
        reader = spark.read.schema(s).option("mode", "DROPMALFORMED")
    return reader.json(path)


def read_csv_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    *,
    header: bool = True,
    sep: str = ",",
    multiline: bool = False,
) -> DataFrame:
    """Read CSV documents with an explicit schema (no inference pass).

    ``multiline=True`` enables quoted embedded newlines — required for
    free-text columns, but it makes each file non-splittable (a single
    task parses the whole file); prefer JSONL for large text corpora.
    """
    s = schema if schema is not None else DOCS_SCHEMA
    return (
        spark.read.schema(s)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("multiLine", str(multiline).lower())
        .option("escape", '"')
        .csv(path)
    )


def read_text_tree(spark: SparkSession, path: str) -> DataFrame:
    """One-document-per-file ingestion: ``(path, text)`` via the
    wholetext reader. The file path is the natural stable document key
    (hash it for a numeric id). Small-files caution at scale: millions
    of tiny files bottleneck on listing + task overhead — compact such
    trees into JSONL/parquet as the FIRST pipeline step, then run
    everything else on the compacted form."""
    df = spark.read.text(path, wholetext=True)
    return df.select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    mode: str = "errorifexists",
) -> None:
    """Write a corpus as (optionally gzipped) JSONL shards — the
    interchange format every downstream LLM-data tool reads. One shard
    per partition: `repartition(n)` beforehand to control shard count/
    size (aim ~100-500 MB compressed). Refuses an existing target by
    default; pass ``mode='overwrite'`` to replace it deliberately."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
