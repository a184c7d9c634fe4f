"""As-of (nearest-timestamp) join — a custom operator Spark lacks.

The reference implements no temporal joins (SURVEY.md §2.2 "absent
everywhere"); this is a beyond-reference pipeline operator. DuckDB's
``ASOF JOIN`` is the oracle.

Spark-first design: NOT a join at all. A sort-merge as-of join would
need a range condition Catalyst turns into a broadcast-nested-loop or
a cartesian at worst. Instead we union the two sides tagged, shuffle
ONCE on the equality keys, sort within each partition by (ts, side),
and carry the most recent right-side payload forward with
``last(ignorenulls=True)`` over a running window. One shuffle, no
join, no range explosion — the plan survives 100× because each key
group is processed streaming in timestamp order (classic
fill-forward). Skew only matters if a single key dominates; callers
can pre-salt such keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "gapfill_locf"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    *,
    suffix: str = "_right",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key group
    (backward as-of, inclusive — DuckDB ``ASOF LEFT JOIN`` with
    ``l.ts >= r.ts``). Unmatched left rows keep null right columns.

    ``right_cols`` selects which right columns to carry (default: all
    except the keys). ``tolerance_us`` drops matches older than the
    given microsecond gap (match becomes null, left row is kept).

    Ties: right rows sharing the exact match timestamp are ordered by
    their remaining payload columns, making the carried row
    deterministic (DuckDB leaves this unspecified — oracle queries
    should project only tie-invariant columns such as the timestamp).
    """
    on = list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    right_cols = list(right_cols)
    if right_ts not in right_cols:
        right_cols = [right_ts] + right_cols

    left_payload = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    right_payload = F.struct(*[F.col(c) for c in right_cols]).alias("_r")

    # Typed nulls for the union: pull each struct's dtype from a
    # zero-row plan (schema-only, no job).
    l_type = left.select(left_payload).schema[0].dataType
    r_type = right.select(right_payload).schema[0].dataType

    lhs = left.select(
        *on,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        left_payload,
        F.lit(None).cast(r_type).alias("_r"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        right_payload,
    )
    unioned = lhs.unionByName(rhs)

    # side=0 (right) sorts before side=1 (left) at equal timestamps,
    # so an exactly-equal right row IS eligible (inclusive bound).
    order: list[Column] = [F.col("_ats").asc(), F.col("_side").asc(), F.col("_r").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_r", ignorenulls=True).over(w))

    out = matched.filter(F.col("_side") == 1)
    if tolerance_us is not None:
        gap = F.unix_micros(F.col("_ats")) - F.unix_micros(F.col("_m")[right_ts])
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(tolerance_us), F.col("_m"))
        )

    proj = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    proj += [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return out.select(*proj)


def gapfill_locf(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    *,
    step: str = "1 hour",
    gap_col: str = "is_gap",
) -> DataFrame:
    """Densify a pre-bucketed time series and fill gaps by carrying
    the last observation forward (the hypertable
    ``time_bucket_gapfill + locf`` shape).

    ``df`` holds at most one row per (``keys``, ``ts_col``) tick;
    the output has exactly one row per key per ``step`` tick from
    that key's first to last observed tick, with every ``value_cols``
    entry LOCF-filled (a null observation is skipped, carrying the
    previous non-null — matching ``last_value(x IGNORE NULLS)``) and
    ``gap_col`` true on ticks that had NO observed row (a row whose
    value is null is an observation, not a gap).

    Spark-first shape, same family as :func:`asof_join`: the grid is
    built by a per-key min/max aggregate + ``sequence``/``explode``
    (never a driver-side calendar), grid and data rows are UNIONED,
    and one window partitioned by ``keys`` ordered by
    (tick, grid-last) carries values forward — one small aggregate
    shuffle plus ONE main shuffle on the keys, no range join, no
    per-tick self-join. Running-frame windows stream each key group
    in order, so a key's cost is its tick span / ``step`` (document
    the span bound when bucketing upstream; a decade at 1-second
    ticks is 3×10^8 grid rows for that key and wants a coarser step
    or a sub-key).
    """
    keys = list(keys)
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must name at least one column")
    interval = F.expr(f"INTERVAL {step}")
    # drop null-tick observations up front: min/max already ignore
    # them for the grid, but ascending sort puts nulls FIRST, so an
    # un-dropped null-ts row would be carried forward into every
    # early tick by last(ignorenulls)
    data = df.where(F.col(ts_col).isNotNull()).select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__grid"),
        *[F.col(c) for c in value_cols],
    )
    vtypes = {f.name: f.dataType for f in data.schema.fields}
    grid = (
        df.groupBy(*keys)
        .agg(F.min(ts_col).alias("__mn"), F.max(ts_col).alias("__mx"))
        .select(
            *keys,
            F.explode(F.sequence("__mn", "__mx", interval)).alias("__ts"),
            F.lit(1).alias("__grid"),
            *[
                F.lit(None).cast(vtypes[c]).alias(c)
                for c in value_cols
            ],
        )
    )
    u = data.unionByName(grid)
    # Data (0) sorts before grid (1) at the same tick, so a grid row
    # sees that tick's own observation as "last".
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__grid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *keys,
        "__ts",
        "__grid",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.last(
            F.when(F.col("__grid") == 0, F.col("__ts")), ignorenulls=True
        )
        .over(w)
        .alias("__obs_ts"),
    )
    return (
        filled.filter(F.col("__grid") == 1)
        .withColumn(
            gap_col,
            F.col("__obs_ts").isNull() | (F.col("__obs_ts") != F.col("__ts")),
        )
        .select(*keys, F.col("__ts").alias(ts_col), *value_cols, gap_col)
    )
