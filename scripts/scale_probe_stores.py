#!/usr/bin/env python
"""Store-lifecycle scale probe (VERDICT r9 item 7): replicate the
sf0.1 corpus ~FACTORxand run the full lifecycle on BOTH standing
stores, recording wall times and re-asserting the plan invariants the
unit tests pin at 1x:

- ANN store: write -> append -> topk query -> delete -> tombstoned
  query -> purge -> purged query; the read plan must stay
  Exchange-free above the bucketed store scans at every stage.
- MinHash store: write -> append shard -> incremental pairs (new
  shard vs standing corpus, never standing self-pairs).

Usage: python scripts/scale_probe_stores.py [sf_dir] [factor]

Writes one JSON line of timings; paste the numbers into SCALING.md.
Runs against a THROWAWAY warehouse in a temp dir — repo state is
untouched.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _timed(times: dict, key: str, fn):
    t0 = time.time()
    out = fn()
    times[key] = round(time.time() - t0, 2)
    print(f"{key:28s} {times[key]:8.2f} s", flush=True)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from polars_text_spark.session import get_spark

    wh = tempfile.mkdtemp(prefix="store_probe_wh_")
    spark = get_spark(
        "store-scale-probe",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": wh,
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}

    try:
        # ---- ANN store at factor x --------------------------------------
        from polars_text_spark.operators import ann_store as A

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            F.col("embedding").isNotNull()
        )
        n1 = emb.count()
        rep = (
            emb.withColumn(
                "rep", F.explode(F.sequence(F.lit(1), F.lit(factor)))
            )
            .withColumn("vec_id", F.col("vec_id") * 1000 + F.col("rep"))
            .drop("rep")
        )
        shard = (
            emb.withColumn("vec_id", F.col("vec_id") * 1000)  # fresh ids
        )
        queries = emb.filter(F.col("vec_id") < 5).withColumn(
            "vec_id", F.col("vec_id") * 1000 + 1
        )
        n_store = n1 * factor
        print(f"ANN store: {n_store} vectors (+{n1} append shard)")

        _timed(times, "ann_write", lambda: A.write_ann_store(
            rep, "probe_ann", dim=64
        ))
        _timed(times, "ann_append", lambda: A.append_ann_shard(
            shard, "probe_ann"
        ))

        def _query():
            return A.topk_from_store(
                spark, "probe_ann", queries, k=10, dim=64
            ).collect()

        base = _timed(times, "ann_query", _query)
        # plan invariant (the unit tests' bucketing contract at 1x,
        # re-checked at factor x): both store tables feed their joins
        # as BUCKETED scans — an Exchange re-partitioning a store scan
        # would drop the "Bucketed: true" marker
        qdf = A.topk_from_store(spark, "probe_ann", queries, k=10, dim=64)
        plan = qdf._jdf.queryExecution().executedPlan().toString()
        store_scan_ok = (
            "probe_ann_bands" in plan
            and "probe_ann_vectors" in plan
            and plan.count("Bucketed: true") == 2
        )
        del_ids = rep.select("vec_id").filter(
            F.col("vec_id") % 20 == 3
        )  # ~5%
        _timed(times, "ann_delete", lambda: A.delete_ids(
            del_ids, "probe_ann"
        ))
        tomb = _timed(times, "ann_query_tombstoned", _query)
        _timed(times, "ann_purge", lambda: A.purge_deleted(
            spark, "probe_ann"
        ))
        purged = _timed(times, "ann_query_purged", _query)
        assert tomb == purged, "tombstoned != purged query answer"
        assert len(purged) == len(base), "rank rows lost"

        # ---- re-bucketing at factor x (round 13) -------------------------
        # the lifecycle step a store grown factor x actually needs:
        # one rewrite shuffle per table into 4x the buckets, answers
        # bit-identical, reads still bucketed at the new count
        _timed(times, "ann_rebucket_8_to_32", lambda: A.rebucket_store(
            spark, "probe_ann", 32
        ))
        rebucketed = _timed(times, "ann_query_rebucketed", _query)
        assert rebucketed == purged, "rebucket changed the answer"
        plan32 = (
            A.topk_from_store(spark, "probe_ann", queries, k=10, dim=64)
            ._jdf.queryExecution().executedPlan().toString()
        )
        store_scan_ok = store_scan_ok and plan32.count("Bucketed: true") == 2

        # ---- MinHash store at factor x ----------------------------------
        from polars_text_spark.operators import dedup_store as D

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("text").isNotNull()
        )
        d1 = docs.count()
        drep = (
            docs.withColumn(
                "rep", F.explode(F.sequence(F.lit(1), F.lit(factor)))
            )
            .withColumn("doc_id", F.col("doc_id") * 1000 + F.col("rep"))
            .drop("rep")
            .select("doc_id", "text")
        )
        dshard = docs.withColumn(
            "doc_id", F.col("doc_id") * 1000
        ).select("doc_id", "text")
        print(f"MinHash store: {d1 * factor} docs (+{d1} append shard)")

        _timed(times, "minhash_write", lambda: D.write_minhash_store(
            drep, "probe_mh"
        ))
        _timed(times, "minhash_append", lambda: D.append_minhash_shard(
            dshard, "probe_mh"
        ))
        pairs = _timed(
            times,
            "minhash_incremental_pairs",
            lambda: D.incremental_pairs_from_store(
                spark, "probe_mh", dshard, jaccard_threshold=0.7
            ).count(),
        )
        _timed(
            times,
            "minhash_rebucket_8_to_32",
            lambda: D.rebucket_minhash_store(spark, "probe_mh", 32),
        )
        pairs_rb = _timed(
            times,
            "minhash_incremental_pairs_rebucketed",
            lambda: D.incremental_pairs_from_store(
                spark, "probe_mh", dshard, jaccard_threshold=0.7
            ).count(),
        )
        assert pairs_rb == pairs, "rebucket changed the pair count"

        result = {
            "metric": "store_lifecycle_probe",
            "sf_dir": sf_dir,
            "factor": factor,
            "ann_vectors": n_store,
            "minhash_docs": d1 * factor,
            "incremental_pairs": pairs,
            "store_scan_exchange_free": bool(store_scan_ok),
            "times_sec": times,
        }
        print(json.dumps(result))
        return 0
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
