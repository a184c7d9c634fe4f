"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line with per-query wall seconds.

Each query is forced to full materialization with a count-style action
(write.format("noop") keeps results off the driver — the bench measures
compute, not collect).

Per-query time is the MIN of $SPARK_GRAFT_BENCH_REPS (default 3) runs:
single-shot timings in a shared JVM carry ±60% noise at these
magnitudes (JIT warm-up, first-run shuffles), which masked real plan
signals in earlier rounds. Min-of-N reports steady-state plan cost.
Persisted intermediates are released between runs so the 30-query
session never accumulates cached blocks."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from polars_text_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_spark("polars-text-spark-bench", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM / parquet footer caches with a trivial action so
    # the first timed query doesn't absorb session start-up.
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.range(1000).groupBy().sum("id").collect()

    from polars_text_spark.persist import release_tracked

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    queries = entrymod.queries()
    timings: dict[str, object] = {}
    errors: dict[str, str] = {}
    for name, fn in queries.items():
        # Fault isolation: one broken query must never abort the whole
        # bench (round 4 shipped zero numbers because it did).
        best = float("inf")
        for _ in range(reps):
            try:
                start = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
            except Exception as exc:  # noqa: BLE001 — record and move on
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                break
            finally:
                release_tracked()
        if name in errors:
            timings[name] = {"err": errors[name]}
        else:
            timings[name] = round(best, 3)

    total = round(sum(t for t in timings.values() if isinstance(t, float)), 3)
    payload = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": len(errors),
        "sf": sf,
    }
    # The driver's BENCH artifact captures only the stdout TAIL, which
    # truncates past ~70 queries — persist the complete per-query map
    # ourselves so every query keeps a tracked number
    # ($SPARK_GRAFT_BENCH_OUT overrides the path; empty disables).
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
