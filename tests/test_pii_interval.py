"""Unit tests for the round-5 operators: PII scan/redaction,
line-level Gopher heuristics, and the binned interval join."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import line_stats
from polars_text_spark.operators.interval import interval_join
from polars_text_spark.operators.pii import pii_counts, redact_pii

# --------------------------------------------------------------------- pii


def _pii_df(spark):
    rows = [
        (1, "mail me at alice.smith+spam@sub.example.co.uk today"),
        (2, "server 192.168.0.1 and 10.0.0.255 are up"),
        (3, "call +1 (415) 555-0042 or +44 20 7946 0958"),
        (4, "no pii here at all"),
        (5, ""),
        (6, None),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_pii_counts(spark):
    out = {
        r["id"]: (r["p"]["n_emails"], r["p"]["n_ipv4"], r["p"]["n_phones"])
        for r in _pii_df(spark).select("id", pii_counts("text").alias("p")).collect()
    }
    assert out[1] == (1, 0, 0)
    assert out[2] == (0, 2, 0)
    assert out[3] == (0, 0, 2)
    assert out[4] == (0, 0, 0)
    assert out[5] == (0, 0, 0)
    assert out[6] == (0, 0, 0)  # NULL text counts as zero


def test_redact_pii(spark):
    out = {
        r["id"]: r["red"]
        for r in _pii_df(spark).select("id", redact_pii("text").alias("red")).collect()
    }
    assert out[1] == "mail me at [EMAIL] today"
    assert out[2] == "server [IP] and [IP] are up"
    assert out[3] == "call [PHONE] or [PHONE]"
    assert out[4] == "no pii here at all"
    assert out[6] is None


def test_phone_does_not_cross_newlines(spark):
    """The phone class allows spaces/tabs but not newlines — a digit
    run on the next line is unrelated content, not the phone."""
    df = spark.createDataFrame(
        [("Call +1 415 555 0042\n2024 annual report",)], "text string"
    )
    got = df.select(redact_pii("text").alias("r")).collect()[0]["r"]
    assert got == "Call [PHONE]\n2024 annual report"


def test_redact_email_keeps_surroundings(spark):
    df = spark.createDataFrame([("a@b.io.",)], "text string")
    got = df.select(redact_pii("text").alias("r")).collect()[0]["r"]
    # trailing sentence period survives (pattern needs 2+ letter TLD
    # after the last dot it consumes)
    assert got == "[EMAIL]."


# -------------------------------------------------------------- line stats


def test_line_stats_hand_computed(spark):
    text = "- first bullet\n\nplain line\nends with...\n* second bullet"
    df = spark.createDataFrame([(text,)], "text string")
    s = df.select(line_stats("text").alias("s")).collect()[0]["s"]
    assert s["n_lines"] == 5
    assert s["blank_ratio"] == pytest.approx(1 / 5)
    assert s["bullet_ratio"] == pytest.approx(2 / 4)  # over non-blank
    assert s["ellipsis_ratio"] == pytest.approx(1 / 4)
    assert s["mean_line_len"] == pytest.approx(
        (len("- first bullet") + 0 + len("plain line") + len("ends with...") + len("* second bullet")) / 5
    )


def test_line_stats_space_padded_lines(spark):
    """Padded lines must be trimmed before the blank/bullet/ellipsis
    tests (regression: a bare F.trim reference inside transform()
    bound the element index to trim's charset param and did nothing)."""
    text = "   \n  - padded bullet  \n  ends with...  "
    df = spark.createDataFrame([(text,)], "text string")
    s = df.select(line_stats("text").alias("s")).collect()[0]["s"]
    assert s["n_lines"] == 3
    assert s["blank_ratio"] == pytest.approx(1 / 3)
    assert s["bullet_ratio"] == pytest.approx(1 / 2)
    assert s["ellipsis_ratio"] == pytest.approx(1 / 2)


def test_line_stats_single_line_and_null(spark):
    df = spark.createDataFrame([(1, "no newlines"), (2, None)], "id long, text string")
    out = {r["id"]: r["s"] for r in df.select("id", line_stats("text").alias("s")).collect()}
    assert out[1]["n_lines"] == 1
    assert out[1]["bullet_ratio"] == 0.0
    assert out[2] is None


# ----------------------------------------------------------- interval join


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def _interval_frames(spark):
    points = spark.createDataFrame(
        [
            (1, "u1", _ts(9, 30)),
            (2, "u1", _ts(10, 0)),   # exactly on an interval end: inclusive
            (3, "u1", _ts(10, 1)),   # outside
            (4, "u2", _ts(9, 30)),   # right user-key matters
            (5, "u1", _ts(23, 59)),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", "morning", _ts(9), _ts(10)),
            ("u1", "night", _ts(23), _ts(23, 59)),
            ("u2", "afternoon", _ts(13), _ts(14)),
        ],
        "user_id string, label string, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def test_interval_join_inner_matches_naive(spark):
    points, intervals = _interval_frames(spark)
    got = interval_join(
        points, intervals, on=["user_id"], bucket_seconds=1800
    )
    rows = {(r["event_id"], r["label"]) for r in got.collect()}
    assert rows == {(1, "morning"), (2, "morning"), (5, "night")}
    # same result as the naive theta join, for any bucket width
    naive = points.join(intervals, "user_id").filter(
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts"))
    )
    naive_rows = {(r["event_id"], r["label"]) for r in naive.collect()}
    assert rows == naive_rows
    for bucket in (60, 3600, 86400):
        again = interval_join(
            points, intervals, on=["user_id"], bucket_seconds=bucket
        )
        assert {(r["event_id"], r["label"]) for r in again.collect()} == naive_rows


def test_interval_join_no_duplicate_pairs(spark):
    # an interval spanning many buckets still matches each point once
    points, intervals = _interval_frames(spark)
    got = interval_join(points, intervals, on=["user_id"], bucket_seconds=60)
    assert got.count() == got.dropDuplicates(["event_id", "label"]).count()


def test_interval_join_left_keeps_unmatched(spark):
    points, intervals = _interval_frames(spark)
    got = interval_join(
        points,
        intervals,
        on=["user_id"],
        bucket_seconds=1800,
        how="left",
        point_id_col="event_id",
    )
    rows = {(r["event_id"], r["label"]) for r in got.collect()}
    assert rows == {
        (1, "morning"),
        (2, "morning"),
        (5, "night"),
        (3, None),
        (4, None),
    }


def test_interval_join_left_with_map_column(spark):
    """The anti-join left path must accept MapType point columns
    (the old exceptAll implementation threw AnalysisException)."""
    points, intervals = _interval_frames(spark)
    points = points.withColumn(
        "props", F.create_map(F.lit("k"), F.col("user_id"))
    )
    got = interval_join(
        points,
        intervals,
        on=["user_id"],
        bucket_seconds=1800,
        how="left",
        point_id_col="event_id",
    )
    rows = {(r["event_id"], r["label"]) for r in got.collect()}
    assert (3, None) in rows and (1, "morning") in rows


def test_interval_join_validations(spark):
    points, intervals = _interval_frames(spark)
    with pytest.raises(ValueError, match="bucket_seconds"):
        interval_join(points, intervals, on=["user_id"], bucket_seconds=0)
    with pytest.raises(ValueError, match="collision"):
        interval_join(
            points.withColumn("label", F.lit("x")), intervals, on=["user_id"]
        )
    with pytest.raises(ValueError, match="how"):
        interval_join(
            points, intervals, on=["user_id"], how="full", point_id_col="event_id"
        )
    with pytest.raises(ValueError, match="point_id_col"):
        interval_join(points, intervals, on=["user_id"], how="left")
