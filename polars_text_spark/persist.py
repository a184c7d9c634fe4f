"""Session-scoped registry of persisted DataFrames.

Several operators persist an intermediate frame that the RETURNED
(lazy) DataFrame still references — e.g. the hashed shingle sets in
:func:`polars_text_spark.operators.dedup.set_similarity_jaccard_pairs`
(consumed three times) or topic modeling's row-id-pinned source frame
(``monotonically_increasing_id`` must be evaluated once). The operator
cannot eagerly ``unpersist()`` — the caller has not acted on the result
yet — so every such persist is registered here, and the caller releases
the batch after the LAST consuming action:

    result = near_dedup(...)
    result.write.parquet(...)        # final consumption
    release_tracked()                # drop the cached blocks

``bench.py`` and the driver-facing ``queries()`` wrappers call
:func:`release_tracked` between queries, so a 30-query session never
accumulates cached blocks that squeeze execution memory (the round-2
verdict's hygiene item). Releasing is safe at any point — Spark just
recomputes on re-use — EXCEPT for frames whose values are
non-deterministic under recompute (topic modeling's row ids): release
those only after the result is fully materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["release_tracked", "track_persist", "tracked_count"]

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Register an already-``persist()``-ed frame for deferred release."""
    _TRACKED.append(df)
    return df


def tracked_count() -> int:
    return len(_TRACKED)


def release_tracked() -> int:
    """Unpersist every tracked frame (blocking=False); returns how many
    were released. Idempotent; failures (e.g. a stopped session) are
    swallowed so cleanup never masks the real result."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass
    return released
