"""Plan introspection helpers (pushdown / broadcast / codegen checks)."""

from polars_text_spark.plans.explain import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "scan_read_schema",
]
