"""Partitioned corpus layout: the 100 TB source/sink discipline.

A 100 TB documents table is not one parquet file — it's an
object-store prefix tree partitioned on the columns queries filter
by (``lang``, ``source``, ingest date). Spark then PRUNES entire
directories at plan time: a query over ``lang = 'de'`` reads ~2% of
a 100 TB corpus instead of scanning it. These helpers write and read
that layout; `tests/test_layout.py` asserts the pruning actually
happens (PartitionFilters on the scan, not a post-scan filter).

Sink guidance encoded here:
- ``partitionBy`` low-cardinality filter columns only (lang/source:
  dozens of dirs). Never high-cardinality keys (doc_id would create
  one directory per row).
- control file sizes with a pre-write ``repartition`` on the
  partition columns + a salt — the classic small-files fix: without
  it every task writes a sliver into every partition dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_partitioned", "read_partitioned"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    *,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write a corpus as a hive-partitioned parquet tree.

    ``files_per_partition`` bounds output files per partition dir via
    a salted repartition (files ≈ partitions × files_per_partition),
    so a 1000-task upstream job doesn't emit 1000 slivers per dir."""
    salt = (F.crc32(F.concat_ws("\x1f", *df.columns)) % files_per_partition).alias(
        "__salt"
    )
    (
        df.withColumn("__salt", salt)
        .repartition(*[F.col(c) for c in partition_cols], F.col("__salt"))
        .drop("__salt")
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-partitioned corpus; filters on partition columns
    become directory pruning (PartitionFilters), not data reads."""
    return spark.read.parquet(path)
