"""Profile a subset of registered queries: per-query wall seconds with
the same methodology as bench.py (noop sink, min-of-reps), restricted
to the names given on the command line. Usage:

    python scripts/profile_queries.py [--reps N] [--explain DIR [--tag before]] q1 q2 ...

With --explain DIR the query's final-frame ``explain("formatted")`` is
written to DIR/<name>_<tag>.txt (tag defaults to "before"). NOTE: for
lifecycle queries the explain only captures the final read plan; their
side-effecting steps are profiled by the dedicated probe scripts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from polars_text_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("polars-text-spark-profile", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()
    spark.range(1000).groupBy().sum("id").collect()

    from polars_text_spark.persist import release_tracked

    queries = entrymod.queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    timings: dict[str, float] = {}
    for name in args.names:
        fn = queries[name]
        best = float("inf")
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}:rep{rep}")
            start = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
            if args.explain and rep == 0:
                os.makedirs(args.explain, exist_ok=True)
                from polars_text_spark.plans.explain import explain_str

                with open(os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(explain_str(df, "formatted"))
            release_tracked()
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
