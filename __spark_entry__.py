"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2
(or a beyond-reference pipeline operator), exercised over the driver's
parquet tables; ``oracle_sql()`` holds the equivalent DuckDB SQL for
the hash-match correctness gate. Non-SQL-expressible ops (model-backed
UDF outputs) get rows-only entries, plus invariant tests in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from polars_text_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-language document profile — scalar text ops +
    tokenize + corpus token stats, over sf0.001 documents."""
    return Q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Each callable first releases persisted frames registered by the
    PREVIOUS query (dedup shingle sets, topic-modeling row-id caches) —
    a 30-query driver session must not accumulate cached blocks."""
    from polars_text_spark.persist import release_tracked

    def with_release(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_tracked()
            return fn(spark, sf_dir)

        wrapped.__name__ = getattr(fn, "__name__", "query")
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return {name: with_release(fn) for name, fn in Q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
