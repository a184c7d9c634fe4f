"""Regression tests for the schema-adaptive events reader.

Round 4 post-mortem: the driver's testdata migrated ``events.ts`` from
TIMESTAMP(NANOS) to plain ``timestamp[us]`` and the hardcoded
nanos-as-long path broke 4 queries, 2 tests, and the bench in one shot.
These tests pin the contract — ``load_events`` returns ``ts`` as
``TimestampType`` for EVERY encoding the testdata has ever shipped —
so the next silent migration fails one targeted test instead.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from polars_text_spark.sources.catalog import load_events, load_table

_ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 1, 123456), 10, "click"),
    (2, datetime.datetime(2024, 1, 1, 0, 0, 2, 654321), 11, "view"),
    (3, datetime.datetime(2024, 1, 2, 12, 30, 0, 0), 10, "click"),
]


def _write_events(path, ts_unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in _ROWS], pa.timestamp(ts_unit)),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
        }
    )
    pq.write_table(table, path)


def test_real_testdata_ts_is_timestamp(spark, sf_dir):
    """Whatever encoding is on disk NOW must come back as timestamp."""
    df = load_events(spark, sf_dir)
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # and it must be actionable, not just analyzable
    assert df.limit(5).count() > 0


def test_load_table_routes_events(spark, sf_dir):
    df = load_table(spark, "events", sf_dir)
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_register_views_all_tables_queryable(spark, sf_dir):
    """`spark.sql` over every registered view works — including
    events, which routes through the adaptive loader."""
    from polars_text_spark.sources.catalog import TABLES, register_views

    register_views(spark, sf_dir)
    for name in TABLES:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").count() >= 0, name
    row = spark.sql(
        "SELECT typeof(ts) AS t FROM events LIMIT 1"
    ).collect()
    assert row[0]["t"] == "timestamp"


@pytest.mark.parametrize("unit", ["us", "ms", "ns"])
def test_all_timestamp_vintages_normalize(spark, tmp_path, unit):
    """us (current testdata), ms, and ns (round 2-4 testdata) parquet
    encodings all normalize to the same UTC wall-clock values."""
    d = tmp_path / f"events_{unit}"
    d.mkdir()
    _write_events(str(d / "events.parquet"), unit)
    df = load_events(spark, str(d))
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    for event_id, ts, _, _ in _ROWS:
        expect = ts if unit != "ms" else ts.replace(microsecond=ts.microsecond // 1000 * 1000)
        assert got[event_id] == expect, (unit, event_id)
