#!/usr/bin/env python
"""Hot-band guard A/B probe (VERDICT r11 #1): measure the LSH candidate
blow-up an unguarded band self-join suffers on a boilerplate-heavy
shard, and that the guard bounds it.

Corpus: HOT identical docs (one boilerplate family — the 'recrawled
template page' scenario) + 10,000 distinct background docs derived from
sf0.1 text offsets. For each hot-family size m:

- ``lsh_band_stats`` arithmetic: unguarded within-bucket candidates
  (16 * m(m-1)/2 for the family) vs guarded (16 * (m-1));
- wall time of ``minhash_lsh_pairs(...).count()`` with band_cap=1000
  vs band_cap=None (the unguarded run is SKIPPED above
  --max-unguarded, default 4000, where the quadratic join stops being
  something you wait for — that asymmetry is the point).

Usage: python scripts/scale_probe_hotband.py [sf_dir] [hot_sizes_csv]
Writes one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

MAX_UNGUARDED = 4000


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hot_sizes = [
        int(s) for s in (sys.argv[2] if len(sys.argv) > 2 else "1000,2000,4000,20000").split(",")
    ]

    from polars_text_spark.operators.dedup import (
        lsh_band_stats,
        minhash_lsh_pairs,
    )
    from polars_text_spark.session import get_spark

    spark = get_spark(
        "hotband-probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    background = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .limit(10_000)
        .select("doc_id", "text")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    boiler = (
        "zqalpha zqbeta zqgamma zqdelta zqepsilon zqzeta zqeta zqtheta "
        "zqiota zqkappa zqlambda zqmu"
    )
    results = []
    for m in hot_sizes:
        hot = spark.range(m).select(
            (F.lit(1_000_000_000) + F.col("id")).alias("doc_id"),
            F.lit(boiler).alias("text"),
        )
        corpus = background.union(hot).localCheckpoint(eager=True)
        stats = lsh_band_stats(corpus, band_cap=1000).collect()[0]
        entry = {
            "hot_size": m,
            "max_bucket": stats.max_bucket_size,
            "saturated_buckets": stats.n_saturated_buckets,
            "unguarded_candidates": stats.unguarded_candidates,
            "guarded_candidates": stats.guarded_candidates,
        }
        t0 = time.time()
        entry["guarded_pairs"] = minhash_lsh_pairs(
            corpus, jaccard_threshold=0.9, band_cap=1000
        ).count()
        entry["guarded_sec"] = round(time.time() - t0, 2)
        if m <= MAX_UNGUARDED:
            t0 = time.time()
            entry["unguarded_pairs"] = minhash_lsh_pairs(
                corpus, jaccard_threshold=0.9, band_cap=None
            ).count()
            entry["unguarded_sec"] = round(time.time() - t0, 2)
        else:
            entry["unguarded_sec"] = None  # not waited for; see docstring
        print(entry, flush=True)
        results.append(entry)
    print(json.dumps({"probe": "hotband_guard", "sf_dir": sf_dir, "runs": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
