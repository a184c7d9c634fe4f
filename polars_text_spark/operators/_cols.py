"""Internal staging-column hygiene.

Several operators stage intermediates as `__`-prefixed projection
columns (``__ptx_*``, ``__wn_*``, ``__salt``, ``__bucket``) so Catalyst
evaluates a non-cheap expression once per row instead of re-inlining it
(SCALING.md). ``withColumn`` on a name that already exists REPLACES the
user's column and the operator then drops it — silent data loss. Every
operator that stages internals calls :func:`require_free_columns` first
and fails loudly instead.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame

__all__ = ["require_free_columns"]


def require_free_columns(df: DataFrame, names: Iterable[str], op: str) -> None:
    """Raise if ``df`` already has any of the internal column ``names``."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input already contains internal staging column(s) "
            f"{clash}; rename or drop them before calling (they would be "
            "silently overwritten and dropped)"
        )
