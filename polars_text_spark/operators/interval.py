"""Binned interval (range) join — a custom operator Spark lacks.

``point.ts BETWEEN interval.start AND interval.end`` has no equi-join
key, so open-source Catalyst plans it as a broadcast-nested-loop (or a
cartesian) — O(points x intervals) comparisons, the classic 100 TB
cliff. The standard fix is BUCKETING the time axis:

- every interval explodes into the fixed-width buckets it overlaps
  (fan-out = interval_length/bucket + 1, bounded and known);
- every point lands in exactly ONE bucket;
- the join becomes a plain equi-join on (keys..., bucket) — one hash
  shuffle — followed by the exact containment filter.

A (point, interval) pair can meet in at most one bucket (the point's),
so no post-join dedup is needed. Pick ``bucket_seconds`` near the
typical interval length: too small inflates the interval fan-out, too
large inflates candidate pairs per bucket.

The reference has no temporal joins at all (SURVEY.md §2.2); DuckDB's
plain ``JOIN ... ON ts BETWEEN lo AND hi`` is the oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.operators._cols import require_free_columns

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    on: Sequence[str] = (),
    bucket_seconds: int = 3600,
    how: str = "inner",
    point_id_col: str | None = None,
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts <= end`` (inclusive both ends — DuckDB ``BETWEEN``)
    and matching ``on`` keys.

    Returns all point columns plus all interval columns; column names
    (outside ``on``) must be disjoint. ``how='left'`` keeps unmatched
    points with NULL interval columns and requires ``point_id_col``
    (a unique point id): unmatched points are recovered with a
    LEFT ANTI join on that id — narrow, MapType-safe, and
    deterministic, where a full-row ``exceptAll`` would ship every
    point column through a set-op shuffle (and reject map columns
    outright).

    ``max_span_buckets`` bounds the per-interval bucket fan-out: one
    dirty sentinel end timestamp (year 9999) with bucket_seconds=3600
    would otherwise make ``F.sequence`` emit ~70M elements for that row
    and fail the whole job on Spark's array-length limit. An interval
    spanning more buckets raises a targeted error naming the limit —
    clean the data or raise ``bucket_seconds``/``max_span_buckets``.
    Inverted intervals (``end < start``) match no points by definition
    and are dropped before the explode instead of fanning out a
    descending ``sequence``.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    if max_span_buckets < 1:
        raise ValueError("max_span_buckets must be >= 1")
    if how == "left" and point_id_col is None:
        raise ValueError(
            "interval_join(how='left') needs point_id_col — a unique "
            "point id to anti-join unmatched points on"
        )
    on = list(on)
    dup = (set(points.columns) - set(on)) & (set(intervals.columns) - set(on))
    if dup:
        raise ValueError(f"column collision outside join keys: {sorted(dup)}")
    require_free_columns(points, ("__bucket",), "interval_join (points)")
    require_free_columns(intervals, ("__bucket",), "interval_join (intervals)")

    b_us = int(bucket_seconds) * 1_000_000
    p = points.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(point_ts)) / F.lit(b_us))
    )
    start_b = F.floor(F.unix_micros(F.col(start_col)) / F.lit(b_us))
    end_b = F.floor(F.unix_micros(F.col(end_col)) / F.lit(b_us))
    n_buckets = end_b - start_b + F.lit(1)
    buckets = F.when(
        n_buckets <= F.lit(int(max_span_buckets)), F.sequence(start_b, end_b)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_join: interval spans "),
                n_buckets.cast("string"),
                F.lit(
                    f" buckets (> max_span_buckets={max_span_buckets}) at "
                    f"bucket_seconds={bucket_seconds}; clean dirty/sentinel "
                    "timestamps or raise bucket_seconds/max_span_buckets"
                ),
            )
        ).cast("array<bigint>")
    )
    iv = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "__bucket", F.explode(buckets)
    )
    joined = (
        p.join(iv, on + ["__bucket"], "inner")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bucket")
    )
    if how == "inner":
        return joined
    if how == "left":
        matched_ids = joined.select(point_id_col).distinct()
        unmatched = points.join(matched_ids, point_id_col, "left_anti")
        for c in intervals.columns:
            if c not in on:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(dict(intervals.dtypes)[c])
                )
        return joined.unionByName(unmatched.select(*joined.columns))
    raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
