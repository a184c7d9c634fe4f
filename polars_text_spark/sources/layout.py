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

__all__ = [
    "write_partitioned",
    "read_partitioned",
    "write_training_shards",
]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    *,
    files_per_partition: int = 1,
    mode: str = "overwrite",
    salt_col: str | None = None,
) -> None:
    """Write a corpus as a hive-partitioned parquet tree.

    ``files_per_partition`` bounds output files per partition dir via
    a salted repartition (files ≈ partitions × files_per_partition),
    so a 1000-task upstream job doesn't emit 1000 slivers per dir.

    The salt must be CHEAP, total, and DETERMINISTIC: pass
    ``salt_col`` (an id-like scalar column) to salt from ``crc32`` of
    that one value, else ``xxhash64`` over all columns is used —
    unlike the old crc32-of-concat_ws scheme it accepts array/struct
    columns (embeddings), though not MapType (pass ``salt_col`` then).
    A row-order salt (``monotonically_increasing_id``) is NOT safe
    here: it changes when a failed task recomputes, so a stage retry
    during the repartition could write duplicate or missing rows
    (the SPARK-23207 round-robin class of bug)."""
    if salt_col is not None:
        salt = F.crc32(F.col(salt_col).cast("string")) % files_per_partition
    else:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), files_per_partition
        )
    salt = salt.alias("__salt")
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


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    *,
    n_shards: int,
    salt: str = "",
    mode: str = "overwrite",
) -> None:
    """Materialize the training order
    (:func:`~polars_text_spark.operators.splits.shard_assignment`
    semantics) as ``path/shard=K/`` parquet dirs whose single file
    holds that shard's rows in ``shard_pos`` order — what a training
    loader streams sequentially, with no RNG state to keep.

    ONE shuffle total, no self-join: the shard id and position are
    computed inline, and the position window's required clustering
    (hash on ``shard``) + sort (``shard, hash, key``) ARE the write
    layout — every shard lives wholly in one task with its rows
    already contiguous and ordered, so the partitioned write emits
    exactly one ordered file per shard directory with no extra
    repartition. Content-keyed end to end: re-running the write (or
    another engine) produces byte-identical shard membership and
    order."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window

    from polars_text_spark.operators._cols import require_free_columns

    require_free_columns(
        df, ("__sh_h", "shard", "shard_pos"), "write_training_shards"
    )
    h = F.sha2(F.concat(F.col(key_col).cast("string"), F.lit(salt)), 256)
    shard = (
        F.conv(F.substring("__sh_h", 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__sh_h"), F.col(key_col))
    (
        df.withColumn("__sh_h", h)
        .withColumn("shard", shard)
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__sh_h")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
