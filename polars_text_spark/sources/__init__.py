"""Data sources: parquet readers, the testdata catalog, and bucketed
tables for shuffle-free co-located joins."""

from polars_text_spark.sources.bucketing import read_bucketed, write_bucketed
from polars_text_spark.sources.catalog import TABLES, load_table, register_views

__all__ = [
    "TABLES",
    "load_table",
    "read_bucketed",
    "register_views",
    "write_bucketed",
]
