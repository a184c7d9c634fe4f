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
from pyspark.sql import functions as F

__all__ = [
    "clear_table",
    "compact_table",
    "minus_tombstones",
    "read_bucketed",
    "read_tombstones",
    "tombstone_ids",
    "write_bucketed",
]


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


def compact_table(
    spark: SparkSession,
    table: str,
    *,
    anti: DataFrame | None = None,
    anti_on: str | list[str] | None = None,
    new_buckets: int | None = None,
) -> int:
    """Rewrite a bucketed table in place, merging append fragments.

    Incremental ingest (``append_ann_shard``-style) adds a new file
    set per bucket per append; after many small appends the store
    reads degrade to many-tiny-file scans. Compaction reads the table,
    repartitions on the bucket columns into exactly ``num_buckets``
    partitions (Spark's hash repartitioning uses the same Murmur3 hash
    as bucketing, so partitions align 1:1 with bucket ids and each
    bucket lands in ONE file), rewrites under a temp name, then swaps
    via DROP + RENAME. Bucket spec, sort spec, and table contents are
    preserved — co-located joins stay shuffle-free (plan-tested).

    ``anti`` (with join keys ``anti_on``) physically drops matching
    rows during the rewrite — the tombstone-merge half of the store
    deletion protocol (``delete_ids`` + ``purge_deleted`` in the store
    modules): tombstones are anti-joined at read time until compaction
    folds them into the files. The anti side is broadcast (tombstone
    sets are small relative to the store), so the rewrite stays one
    pass, one shuffle (the bucket repartition it already does).

    Returns the number of data files after compaction. Not atomic: a
    reader concurrent with the swap can observe the drop; run it in
    the same maintenance window as the appends it merges.

    ``new_buckets`` rewrites the table under a DIFFERENT bucket count
    (same bucket/sort columns) — the re-bucketing half of the store
    lifecycle: a store that grew 100x past its write-time bucket count
    reads corpus/buckets rows per co-located task, and the only cure
    is one rewrite shuffle into more buckets. Contents are unchanged;
    co-located joins stay shuffle-free at the NEW count (both tables
    of a store must be rewritten together — see ``rebucket_store`` /
    ``rebucket_minhash_store``).
    """
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        raise ValueError(f"table '{table}' is not bucketed")
    # the swap is DROP + RENAME (not atomic); a cached table means a
    # live reader holds block references that the drop would
    # invalidate mid-query — refuse rather than corrupt
    try:
        cached = spark.catalog.isCached(table)
    except Exception:
        cached = False  # isCached can throw for exotic catalog states; proceed
    if cached:
        raise ValueError(
            f"table '{table}' is currently cached; uncache it "
            "before compaction (the DROP+RENAME swap would "
            "invalidate reader state)"
        )
    buckets = int(info["Num Buckets"])
    if new_buckets is not None:
        if new_buckets < 1:
            raise ValueError(f"new_buckets must be >= 1, got {new_buckets}")
        buckets = int(new_buckets)

    def _cols(key: str) -> list[str]:
        raw = info.get(key, "[]").strip("[]")
        return [c.strip().strip("`") for c in raw.split(",") if c.strip()]

    bucket_cols = _cols("Bucket Columns")
    sort_cols = _cols("Sort Columns")
    # the catalog's own Location, NOT warehouse-dir + table-name
    # reconstruction — the latter breaks for non-default databases
    # (<warehouse>/db.db/tbl) and custom-location tables
    if "Location" not in info:
        raise ValueError(f"table '{table}' reports no Location")
    location = info["Location"].removeprefix("file:")
    tmp = f"{table}__compact"
    clear_table(spark, tmp)
    # Read the raw FILES, not the catalog table: a table-scan advertises
    # the bucket partitioning, so the planner elides the repartition as
    # redundant and each input fragment writes its own output file —
    # exactly the fragmentation we're here to undo. The plain file scan
    # carries no partitioning claim, so the repartition applies and each
    # bucket lands in one task (repartition hash == bucketing hash).
    df = spark.read.parquet(location)
    if anti is not None:
        keys = [anti_on] if isinstance(anti_on, str) else list(anti_on or [])
        if not keys:
            raise ValueError("anti requires anti_on join keys")
        df = df.join(F.broadcast(anti.select(keys)), keys, "left_anti")
    df = df.repartition(buckets, *[F.col(c) for c in bucket_cols])
    write_bucketed(
        df,
        tmp,
        bucket_by=bucket_cols,
        buckets=buckets,
        sort_by=sort_cols or None,
    )
    clear_table(spark, table)
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    # re-resolve: the rename moved the managed directory
    final_rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    final_loc = {
        r["col_name"]: r["data_type"] for r in final_rows
    }["Location"].removeprefix("file:")
    return sum(
        1
        for root, _, files in os.walk(final_loc)
        for f in files
        if f.endswith(".parquet")
    )


def probe_id_clash(
    shard: DataFrame,
    standing: DataFrame,
    ts: DataFrame | None,
    *,
    id_col: str,
):
    """First shard id already present in ``standing`` (a bucketed
    store's id column) or in the tombstone set ``ts``, else None.

    Join direction matters at scale: the SHARD is the probe side
    (semi-joined against the store), never broadcast — a web-scale
    daily shard would blow the broadcast limit — and the standing
    side is the id-bucketed store table, so its side of the join
    reads co-located buckets without a shuffle; only the shard (the
    O(shard) bound appends document) moves. The tombstone set is
    checked with a broadcast build (deletion batches are small)."""
    shard_ids = shard.select(F.col(id_col).alias("id"))
    clash = (
        shard_ids.join(standing.select("id"), "id", "left_semi")
        .limit(1)
        .collect()
    )
    if not clash and ts is not None:
        # a tombstoned id is still physically present (or about to be
        # anti-joined away at read time) — re-appending it before
        # purge_deleted would be silently swallowed by the read-time
        # anti-join, so it clashes too
        clash = (
            shard_ids.join(F.broadcast(ts), "id", "left_semi")
            .limit(1)
            .collect()
        )
    return clash[0]["id"] if clash else None


def tombstone_ids(ids: DataFrame, name: str, *, id_col: str) -> None:
    """Append a batch of ids to the store's ``<name>_tombstones``
    table (single ``id`` column) — the logical half of the deletion
    protocol shared by the MinHash and ANN stores: O(batch) per
    delete, read paths anti-join the set, compaction reclaims."""
    spark = ids.sparkSession
    frame = ids.select(F.col(id_col).alias("id")).distinct()
    exists = spark.catalog.tableExists(f"{name}_tombstones")
    if not exists:
        clear_table(spark, f"{name}_tombstones")  # stale dir from a drop
    frame.write.format("parquet").mode(
        "append" if exists else "overwrite"
    ).saveAsTable(f"{name}_tombstones")


def read_tombstones(spark: SparkSession, name: str) -> DataFrame | None:
    """The store's tombstone id set, or None if nothing was ever
    deleted (the common case — zero read overhead)."""
    if not spark.catalog.tableExists(f"{name}_tombstones"):
        return None
    # no .distinct(): the consumers are left-anti builds (duplicate
    # build keys are harmless) and it would add a shuffle to every read
    return spark.table(f"{name}_tombstones").select("id")


def minus_tombstones(df: DataFrame, ts: DataFrame | None, *, on: str = "id") -> DataFrame:
    """Anti-join a store frame against the tombstone set. The
    tombstone side is broadcast (a deletion batch is small relative
    to the store), so the store side keeps its bucket co-location —
    NO Exchange appears above the store scan (plan-tested)."""
    if ts is None:
        return df
    keyed = ts.select(F.col("id").alias(on)) if on != "id" else ts
    return df.join(F.broadcast(keyed), on, "left_anti")
