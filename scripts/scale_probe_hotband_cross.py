#!/usr/bin/env python
"""Hot-band guard A/B probe, CROSS/incremental face (VERDICT r12 #4):
a saturated STANDING family meeting a boilerplate-heavy shard — the
recrawl-ingest scenario the self-join probe (scale_probe_hotband.py)
does not cover.

Standing corpus: 10,000 distinct background docs (sf0.1 text) + one
HOT identical boilerplate family (default 10,000 members). Shard:
1,000 docs matching the family + 100 novel docs. Measured both ways
(band_cap=1000 vs None), on both cross paths:

- ``minhash_lsh_cross_pairs`` (in-flight signatures): candidate count
  from ``_guarded_cross_candidates`` and wall of the full verified
  pair count. Unguarded, every shard-family doc pairs with every one
  of the 10k standing members -> 10^7 verified pairs; guarded, the
  standing bucket reduces to its signature representative -> one pair
  per shard-family doc.
- ``incremental_pairs_from_store`` (standing side = bucketed store,
  the zero-reshuffle ingest path): wall both ways against the same
  standing corpus written once with ``write_minhash_store``.

Usage: python scripts/scale_probe_hotband_cross.py [sf_dir] [hot_size]
Writes one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hot_size = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from polars_text_spark.operators.dedup import (
        _banded_signatures,
        _guarded_cross_candidates,
        minhash_lsh_cross_pairs,
    )
    from polars_text_spark.operators.dedup_store import (
        incremental_pairs_from_store,
        write_minhash_store,
    )
    from polars_text_spark.session import get_spark

    spark = get_spark(
        "hotband-cross-probe",
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
    hot = spark.range(hot_size).select(
        (F.lit(1_000_000_000) + F.col("id")).alias("doc_id"),
        F.lit(boiler).alias("text"),
    )
    standing = background.union(hot).localCheckpoint(eager=True)
    shard = (
        spark.range(1_000)
        .select(
            (F.lit(2_000_000_000) + F.col("id")).alias("doc_id"),
            F.lit(boiler).alias("text"),
        )
        .union(
            spark.range(100).select(
                (F.lit(3_000_000_000) + F.col("id")).alias("doc_id"),
                F.concat(
                    F.lit("pqnovel pqcrawl pqpage pqnever pqseen pqnew "),
                    F.col("id").cast("string"),
                ).alias("text"),
            )
        )
        .localCheckpoint(eager=True)
    )

    out = {
        "probe": "hotband_guard_cross",
        "sf_dir": sf_dir,
        "standing_rows": standing.count(),
        "hot_size": hot_size,
        "shard_rows": shard.count(),
        "runs": {},
    }

    # candidate volume, both ways (slim count — no verification)
    bl = _banded_signatures(
        shard, "text", "doc_id", "id_a",
        num_perm=64, bands=16, shingle_n=3,
    )
    br = _banded_signatures(
        standing, "text", "doc_id", "id_b",
        num_perm=64, bands=16, shingle_n=3,
    )
    for cap, key in ((1000, "guarded"), (None, "unguarded")):
        t0 = time.time()
        n = _guarded_cross_candidates(
            bl, br.select("id_b", "bk", F.col("__sig")), ["bk"], cap,
            star_by=("__sig",),
        ).count()
        out["runs"][f"candidates_{key}"] = {
            "n": n, "sec": round(time.time() - t0, 2)
        }
        print(f"candidates_{key}", out["runs"][f"candidates_{key}"], flush=True)

    # full verified cross pairs: (band_cap, collapse_left) matrix —
    # the 1,000 set-identical shard docs are exactly the left-side
    # exposure the collapse closes (round 13)
    matrix = (
        (1000, True, "guarded_collapsed"),
        (1000, False, "guarded"),
        (None, True, "unguarded_collapsed"),
        (None, False, "unguarded"),
    )
    for cap, col, key in matrix:
        t0 = time.time()
        n = minhash_lsh_cross_pairs(
            shard, standing, jaccard_threshold=0.9, band_cap=cap,
            collapse_left=col,
        ).count()
        out["runs"][f"cross_pairs_{key}"] = {
            "pairs": n, "sec": round(time.time() - t0, 2)
        }
        print(f"cross_pairs_{key}", out["runs"][f"cross_pairs_{key}"], flush=True)

    # incremental-ingest face: standing side is the bucketed store
    write_minhash_store(standing, "hotband_cross_probe", buckets=8)
    for cap, col, key in matrix:
        t0 = time.time()
        n = incremental_pairs_from_store(
            spark, "hotband_cross_probe", shard,
            jaccard_threshold=0.9, band_cap=cap, collapse_left=col,
        ).count()
        out["runs"][f"store_incremental_{key}"] = {
            "pairs": n, "sec": round(time.time() - t0, 2)
        }
        print(
            f"store_incremental_{key}",
            out["runs"][f"store_incremental_{key}"],
            flush=True,
        )

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
