"""Stream-static interval join: the bucketed interval_join is a pure
equi-join + filter, so it runs unchanged with a STREAMING point side
against a static interval table (Spark supports stream-static
equi-joins natively; a raw BETWEEN theta-join would not stream).
Asserts stream output == batch output on the same files."""

from __future__ import annotations

import datetime

from polars_text_spark.operators.interval import interval_join


def _frames(spark):
    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    points = spark.createDataFrame(
        [
            (1, "u1", t(9, 30)),
            (2, "u1", t(10, 0)),
            (3, "u1", t(10, 1)),
            (4, "u2", t(9, 45)),
            (5, "u2", t(13, 30)),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", "morning", t(9), t(10)),
            ("u2", "afternoon", t(13), t(14)),
        ],
        "user_id string, label string, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def test_stream_static_interval_join_matches_batch(spark, tmp_path):
    points, intervals = _frames(spark)
    drop_dir = str(tmp_path / "points")
    points.write.parquet(drop_dir)

    stream_points = (
        spark.readStream.schema(points.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    joined = interval_join(
        stream_points, intervals, on=["user_id"], bucket_seconds=1800
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("stream_interval")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    got = {
        (r["event_id"], r["label"])
        for r in spark.sql("SELECT * FROM stream_interval").collect()
    }
    batch = {
        (r["event_id"], r["label"])
        for r in interval_join(
            points, intervals, on=["user_id"], bucket_seconds=1800
        ).collect()
    }
    assert got == batch == {(1, "morning"), (2, "morning"), (5, "afternoon")}
