"""Physical-plan assertions used by tests and the bench harness.

The reference proves its pushdown behavior *behaviorally*
(tests/test_tokenize_cache.py:65-111 observes which rows reach the
tokenizer). Spark lets us assert it *structurally*: the formatted plan
names the pushed filters and the pruned read schema on every parquet
scan, and marks broadcast joins. These helpers are how the test suite
pins "the plan we'd want at 100 TB", not just "a plan that passed".
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["explain_str", "has_broadcast_join", "pushed_filters", "scan_read_schema"]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema entries — proves column pruning reached the scan."""
    plan = explain_str(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)
