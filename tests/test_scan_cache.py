"""Round-16 metadata memos: scan_parquet's footer-schema cache and
spread_scan's widening-probe memo must be invisible to results —
metadata only, every scan still reads the files."""

from __future__ import annotations

from polars_text_spark.sources.catalog import (
    _SCHEMA_CACHE,
    _SPREAD_PROBE_CACHE,
    scan_parquet,
    spread_scan,
)


def test_scan_parquet_schema_memo_identical_results(spark, sf_dir):
    path = f"{sf_dir}/documents.parquet"
    _SCHEMA_CACHE.pop(path, None)
    first = scan_parquet(spark, path)
    assert path in _SCHEMA_CACHE  # first read populated the memo
    second = scan_parquet(spark, path)  # served with explicit schema
    assert second.schema == first.schema
    rows_first = sorted(r["doc_id"] for r in first.select("doc_id").collect())
    rows_second = sorted(
        r["doc_id"] for r in second.select("doc_id").collect()
    )
    assert rows_first == rows_second


def test_scan_parquet_sees_new_data_files(spark, tmp_path):
    """The memo caches SCHEMA, never file listings or results: rows
    appended to the directory after the first read are visible to the
    next scan."""
    path = str(tmp_path / "grow.parquet")
    spark.range(5).write.parquet(path)
    assert scan_parquet(spark, path).count() == 5
    spark.range(5, 12).write.mode("append").parquet(path)
    assert scan_parquet(spark, path).count() == 12


def test_spread_scan_memo_same_decision(spark, sf_dir):
    path = f"{sf_dir}/documents.parquet"
    df = scan_parquet(spark, path)
    _SPREAD_PROBE_CACHE.clear()
    unmemod = spread_scan(df, 8)
    memod_first = spread_scan(df, 8, memo_key=path)
    memod_second = spread_scan(df, 8, memo_key=path)
    assert (path, 8) in _SPREAD_PROBE_CACHE
    assert (
        unmemod.rdd.getNumPartitions()
        == memod_first.rdd.getNumPartitions()
        == memod_second.rdd.getNumPartitions()
    )
