"""Deterministic train/val/test splitting, leakage auditing, and
training-shard assignment (beyond-reference, LLM-pipeline layer).

Three concerns every training-data pipeline hits after curation:

- **Splitting must be content-keyed and group-aware.** A row's split
  must depend only on its key — reruns, backfills, and a DuckDB audit
  all agree row-for-row (same mechanism as
  :mod:`polars_text_spark.operators.sampling`: first 8 hex chars of
  ``sha256(key || salt)`` against cumulative thresholds, pure Catalyst,
  fused into the scan). With ``group_col`` the HASH KEY is the group,
  so every row of a group (a domain, a crawl host, a duplicate
  cluster) lands in the same split — the standard defense against
  train/val leakage through correlated rows.
- **Near-duplicate leakage must be auditable.** Group-keying by
  ``source`` can't see duplicates that straddle sources; the
  principled audit joins the split assignment against duplicate
  FAMILIES (:func:`polars_text_spark.operators.components.
  connected_components` over any dedup pair stream) and flags
  non-train rows whose family contains a train member.
- **The final corpus must shard deterministically.** Training jobs
  want N equal-ish shards with a stable pseudo-random document order
  (a "global shuffle" that is reproducible and engine-auditable):
  shard = integer of the key hash mod N, order within shard = the
  hash itself. One shuffle on the shard id; ordered parquet writes
  per shard.

All hash math is sha256-hex based, bit-identical between Spark's
``sha2`` and DuckDB's ``sha256`` — every operator here is fully
oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_text_spark.operators._cols import require_free_columns

__all__ = ["assign_splits", "shard_assignment", "split_leakage"]

_HEX_SPAN = 16 ** 8


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float],
    *,
    salt: str = "",
    group_col: str | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Append ``out_col``: the split label of each row.

    ``splits`` maps label -> fraction (must sum to 1 within 1e-9;
    iteration order fixes the hash-interval layout, and any rounding
    residue in the last interval goes to the LAST label — make it the
    biggest split, conventionally ``train``). The hash key is
    ``group_col`` when given (whole groups move together), else
    ``key_col``.

    Map-only: one sha + one CASE per row, no shuffle, no state."""
    if len(splits) < 2:
        raise ValueError("assign_splits needs >= 2 split labels")
    fracs = list(splits.values())
    if any(f <= 0 for f in fracs):
        raise ValueError(f"split fractions must be > 0: {splits}")
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1: {splits}")
    require_free_columns(df, (out_col,), "assign_splits")

    hash_key = F.col(group_col if group_col is not None else key_col)
    h8 = F.substring(
        F.sha2(F.concat(hash_key.cast("string"), F.lit(salt)), 256), 1, 8
    )
    # A NULL hash key would null every interval comparison and fall
    # through to the LAST label — silently skewing the split. Fail fast
    # at the first null row instead (runtime, inside the projection).
    h8 = F.when(
        hash_key.isNull(),
        F.raise_error(
            F.lit(
                "assign_splits: null hash key (key_col/group_col) — "
                "fill or filter null keys before splitting"
            )
        ),
    ).otherwise(h8)
    labels = list(splits)
    expr = None
    acc = 0.0
    for label, frac in list(splits.items())[:-1]:
        acc += frac
        threshold = format(min(int(acc * _HEX_SPAN), _HEX_SPAN - 1), "08x")
        cond = h8 < F.lit(threshold)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    expr = expr.otherwise(F.lit(labels[-1]))
    return df.withColumn(out_col, expr)


def split_leakage(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    *,
    train_value: str = "train",
) -> DataFrame:
    """Near-duplicate leakage audit of a split assignment.

    ``pairs`` is any dedup pair stream ``(id_a, id_b)`` (MinHash, exact
    Jaccard, SemDeDup ...). Returns one row per NON-train input row::

        id_col        (original name)
        component     duplicate-family id (min member; own id when the
                      row has no duplicates)
        split         the row's split label
        contaminated  true iff the family contains >= 1 train row

    ``filter(contaminated)`` is the eval set you must re-draw (or the
    rows to drop) before the benchmark means anything — the near-dup
    generalization of n-gram decontamination
    (:func:`polars_text_spark.operators.decontam.ngram_contamination`).

    Scale shape: components over the pair graph (hash-min + path
    halving — never all-pairs), then the per-family train flag is ONE
    aggregate over the labeled vertices and a broadcast-size join back;
    rows outside the pair graph short-circuit to singleton families
    with ``contaminated = false`` via a left join, costing nothing.
    """
    from polars_text_spark.operators.components import connected_components

    require_free_columns(
        df, ("__sl_comp", "__sl_has_train"), "split_leakage"
    )
    from polars_text_spark.persist import track_persist

    comp = connected_components(pairs).select(
        F.col("vertex").alias(id_col), F.col("component").alias("__sl_comp")
    )
    labeled = df.select(id_col, split_col).join(comp, id_col, "left")
    labeled = labeled.withColumn(
        "__sl_comp", F.coalesce("__sl_comp", F.col(id_col))
    )
    # consumed twice (family aggregate + final join): persist so the
    # scan + component join don't run twice
    labeled = track_persist(labeled.persist())
    fam = labeled.groupBy("__sl_comp").agg(
        F.max((F.col(split_col) == train_value).cast("int")).alias(
            "__sl_has_train"
        )
    )
    return (
        labeled.join(fam, "__sl_comp")
        # null-safe: rows with a NULL split label (e.g. from a left-join
        # of a partial assignment) are non-train and MUST stay in the
        # audit — plain != would null them out of the result
        .filter(~F.col(split_col).eqNullSafe(train_value))
        .select(
            id_col,
            F.col("__sl_comp").alias("component"),
            F.col(split_col).alias("split"),
            (F.col("__sl_has_train") == 1).alias("contaminated"),
        )
    )


def shard_assignment(
    df: DataFrame,
    key_col: str,
    *,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training output:
    ``(key_col, shard, shard_pos)``.

    ``shard`` = first-8-hex of ``sha256(key || salt)`` as an integer
    mod ``n_shards`` — uniform, content-keyed, reproducible.
    ``shard_pos`` = rank within the shard ordered by the FULL hash
    (ties broken by key): the pseudo-random document order a training
    loader reads sequentially, with no RNG state to keep.

    One shuffle partitioned by ``shard``; the per-shard sort is the
    write order. At 100 TB: ``repartition(n_shards, "shard")`` then
    ``sortWithinPartitions("shard_pos")`` and a partitioned write —
    every executor streams exactly one shard, nothing collects.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    require_free_columns(df, ("__sh_h",), "shard_assignment")
    h = F.sha2(F.concat(F.col(key_col).cast("string"), F.lit(salt)), 256)
    d = df.select(key_col).withColumn("__sh_h", h)
    shard = (
        F.conv(F.substring("__sh_h", 1, 8), 16, 10).cast("long")
        % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__sh_h"), F.col(key_col))
    return (
        d.withColumn("shard", shard)
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("long"))
        .select(key_col, "shard", "shard_pos")
    )
