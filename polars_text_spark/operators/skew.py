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

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` to ``small`` on ``on`` with an added
    ``salt``-way salt key. ``how`` is ``inner`` or ``left`` (left =
    keep unmatched ``big`` rows) — the outcomes where salting is
    row-equivalent to the plain join. Non-key column names must be
    disjoint, like a plain ``join``.

    The big side's salt is ``monotonically_increasing_id() % salt``:
    row-order derived, zero hashing cost, and spreads ANY key's rows
    evenly — correctness never depends on which salt a row gets.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on)
    b = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    )
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    return b.join(s, on + ["__salt"], how).drop("__salt")
