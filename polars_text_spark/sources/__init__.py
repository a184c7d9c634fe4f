"""Data sources: parquet/CSV/JSON readers + the testdata catalog."""

from polars_text_spark.sources.catalog import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
