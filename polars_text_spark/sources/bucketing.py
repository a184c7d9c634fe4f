"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of repeated joins on the same key (doc_id,
content hash, user_id) is re-shuffling the fact table every query.
Writing it bucketed by the join key once moves that shuffle to write
time: subsequent equi-joins between tables bucketed on the same key
with the same bucket count execute WITHOUT an Exchange on either side,
and groupBy on the bucket key skips the shuffle too.

Spark's bucketing rides the session catalog (saveAsTable); locally
that is the spark-warehouse directory, on a cluster the metastore.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["clear_table", "read_bucketed", "write_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str | list[str],
    buckets: int,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``buckets`` should match across every table that will be joined on
    ``bucket_by`` — mismatched counts force one side to re-shuffle.
    """
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    if mode == "overwrite":
        clear_table(df.sparkSession, table)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort_by is not None:
        sort_keys = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)


def clear_table(spark: SparkSession, table: str) -> None:
    """Drop a managed table AND its warehouse directory. A
    previously-dropped (or previous-session) managed table can leave
    its directory behind, which saveAsTable refuses to reuse
    (LOCATION_ALREADY_EXISTS) — clear both before an overwrite."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    location = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(location):
        shutil.rmtree(location)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
