"""Corpus snapshot diff — incremental-ingest bookkeeping.

A recurring 100 TB-pipeline task: a new crawl/dump lands and the
pipeline needs to know what actually changed before re-running dedup,
filtering and training-shard builds over everything. The diff is the
gate that turns a full recompute into an incremental one (only
``added``/``modified`` rows flow into the downstream incremental paths
— e.g. :func:`polars_text_spark.operators.dedup.minhash_lsh_cross_pairs`
and the bucketed fingerprint store).

Scale: one full-outer join on the id key — both sides shuffle once on
``id``; content comparison is on sha2-256 fingerprints, so no text
crosses the join (the fingerprint projection happens map-side before
the exchange). Output is one row per id in either snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import doc_fingerprint

__all__ = ["snapshot_diff"]

STATUSES = ("added", "removed", "modified", "unchanged")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classify every id across two corpus snapshots.

    Returns ``(id_col, status)`` with status one of ``added`` (id only
    in ``new``), ``removed`` (only in ``old``), ``modified`` (both, but
    normalized-content fingerprints differ) or ``unchanged``. Null
    texts fingerprint as null; two null texts compare as unchanged
    (null-safe equality), null-vs-text as modified — a crawl that
    drops a body is a modification, not an add/remove.

    Requires ``id_col`` to be unique within each snapshot (the join
    would otherwise fan out); pre-aggregate duplicate ids first.
    """
    o = old.select(
        F.col(id_col).alias("__id"), doc_fingerprint(text_col).alias("__fp_old")
    )
    n = new.select(
        F.col(id_col).alias("__id"), doc_fingerprint(text_col).alias("__fp_new")
    )
    j = o.withColumn("__in_old", F.lit(True)).join(
        n.withColumn("__in_new", F.lit(True)), "__id", "full"
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old").eqNullSafe(F.col("__fp_new")), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return j.select(F.col("__id").alias(id_col), status.alias("status"))
