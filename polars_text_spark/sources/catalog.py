"""Testdata catalog: the TPC-H-ish star schema + text/embedding tables.

At 100 TB these would be partitioned/bucketed external tables; here
they are single parquet files per table (TESTDATA.md). Readers stay
declarative (``spark.read.parquet``) so Catalyst keeps predicate
pushdown, column pruning and partition pruning on the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise KeyError(f"unknown table '{name}'; known: {TABLES}")
    if name == "events":
        return load_events(spark, sf)
    return spark.read.parquet(f"{sf}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default. Read nanos as long and convert to a
    microsecond timestamp (floor division — matches DuckDB's own
    ns -> us truncation, so oracles agree)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Integer division: `/` would promote epoch-nanos (~1.7e18, double
    # ulp = 256 there) to double and round across us boundaries.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` works."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
