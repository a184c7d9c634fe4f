"""Skew-busting salted equi-join (beyond-reference, 100 TB tooling).

A shuffle join hashes each key to ONE reducer, so a hot key (the empty
document, a null-ish placeholder id, one viral URL) lands its entire
row set on a single straggler task. AQE's skew-join split handles many
cases at runtime, but only for sort-merge joins it can observe — and
not when the skew is introduced by an upstream operator the optimizer
can't see through. ``salted_join`` is the explicit, deterministic fix:

- the BIG (skewed) side scatters each row over ``salt`` sub-keys;
- the SMALL side (too big to broadcast, else you'd broadcast) is
  replicated once per sub-key (a ``salt``-way explode, cost =
  ``salt × |small|`` shuffle rows);
- the equi-join runs on ``(keys..., salt_id)``, so a hot key's rows
  spread over ``salt`` reducers instead of one.

The result is row-identical to the unsalted join for ``inner`` and
``left`` joins — salting only re-partitions the work.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.operators._cols import require_free_columns

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Equi-join ``big`` to ``small`` on ``on`` with an added
    ``salt``-way salt key. ``how`` is ``inner`` or ``left`` (left =
    keep unmatched ``big`` rows) — the outcomes where salting is
    row-equivalent to the plain join. Non-key column names must be
    disjoint, like a plain ``join``.

    The salt must be DETERMINISTIC per row: a shuffle-join key derived
    from row order (``monotonically_increasing_id``) changes when a
    failed map task recomputes, so a partial stage retry could send a
    row to a different reducer than one that already consumed it —
    duplicating or dropping rows. Default: ``xxhash64`` over the big
    side's non-key columns (content-derived, stable under recompute).
    Pass ``salt_col`` (an id-like scalar) to hash one column instead —
    cheaper, and required when a non-key column is a MapType
    (``xxhash64`` rejects maps).

    LIMITATION of the content-derived default: fully-IDENTICAL big-side
    rows hash to the same salt and still co-locate. That is harmless
    for organic skew (hot key, varied payloads) but defeats the
    operator when the skew IS duplication — a hot key whose rows are
    byte-identical (the empty document, a placeholder id row repeated
    millions of times). If your data can contain duplicate rows under a
    hot key, pass ``salt_col`` pointing at a UNIQUE row id (add one
    upstream if needed — a stored id, not
    ``monotonically_increasing_id``, which is retry-unsafe here). A
    per-partition positional component can't be mixed in safely for the
    same retry reason.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    require_free_columns(big, ("__salt",), "salted_join (big side)")
    require_free_columns(small, ("__salt",), "salted_join (small side)")
    on = list(on)
    if salt_col is not None:
        salt_src = F.xxhash64(F.col(salt_col))
    else:
        non_key = [c for c in big.columns if c not in on] or on
        salt_src = F.xxhash64(*[F.col(c) for c in non_key])
    b = big.withColumn("__salt", F.pmod(salt_src, F.lit(salt)).cast("int"))
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    return b.join(s, on + ["__salt"], how).drop("__salt")
