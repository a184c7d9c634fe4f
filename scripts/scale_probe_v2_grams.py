#!/usr/bin/env python
"""v2 token-hash-window gram family A/B probe (VERDICT r13 item 1):
replicate the sf0.1 documents table FACTORx and time each windowed-gram
operator under (a) the round-14 v2 default (tokens xxhash64'd once,
gram hash over the token-hash window) and (b) the v1 per-window
concat_ws string build hashed with xxhash64 — the same production hash,
so the delta is purely the string-build tax.

Covered paths (the ones VERDICT r13 named):
- winnowing fingerprint selection + overlap pairs (operators/winnow.py)
- duplicated-span coverage + span strip (operators/spans.py)
- decontamination shingle stream (operators/decontam.py token_ngrams)

Usage: python scripts/scale_probe_v2_grams.py [sf_dir] [factor]
Writes one JSON line of timings; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _timed(times: dict, key: str, fn):
    t0 = time.time()
    out = fn()
    times[key] = round(time.time() - t0, 2)
    print(f"{key:34s} {times[key]:8.2f} s", flush=True)
    return out


# a CALLABLE gram_hash selects the per-window string build in both
# winnow and spans — passing xxhash64 through a lambda reproduces the
# v1 family exactly (spans maps a bare F.xxhash64 to v2 on purpose)
def _v1_xxhash(c):
    return F.xxhash64(c)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from polars_text_spark.operators.decontam import (
        ngram_contamination,
        token_ngrams,
    )
    from polars_text_spark.operators.spans import (
        dup_ngram_coverage,
        strip_duplicate_spans,
    )
    from polars_text_spark.operators.winnow import winnow_overlap_pairs
    from polars_text_spark.session import get_spark

    spark = get_spark(
        "v2-gram-probe",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    reps = spark.range(factor).select(F.col("id").alias("__rep"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * factor + F.col("__rep")).alias("doc_id"),
            # perturb replicas so replicated docs don't all pair up
            F.concat(F.col("text"), F.lit(" rep"), F.col("__rep")).alias(
                "text"
            ),
        )
    )
    n = _timed(times, "corpus_materialize", lambda: big.count())
    print(f"corpus: {n} docs ({factor}x {sf_dir})", flush=True)

    # --- winnowing: fingerprint selection is the dominant cost;
    # min_shared high enough that the pair join stays small
    for key, kw in (
        ("winnow_pairs_v2", {}),
        ("winnow_pairs_v1_string", {"gram_hash": _v1_xxhash}),
    ):
        _timed(
            times,
            key,
            lambda kw=kw: winnow_overlap_pairs(
                big, k=5, w=4, min_shared=3, max_df=64, **kw
            ).count(),
        )

    # --- span coverage (gram projection runs twice by design)
    for key, kw in (
        ("span_coverage_v2", {}),
        ("span_coverage_v1_string", {"gram_hash": _v1_xxhash}),
    ):
        _timed(
            times,
            key,
            lambda kw=kw: dup_ngram_coverage(
                big, n=5, min_df=2, **kw
            ).agg(F.sum("dup_tokens")).collect(),
        )

    # --- span strip (coverage + anti-join + rebuild)
    for key, kw in (
        ("strip_spans_v2", {}),
        ("strip_spans_v1_string", {"gram_hash": _v1_xxhash}),
    ):
        _timed(
            times,
            key,
            lambda kw=kw: strip_duplicate_spans(
                big, n=5, min_df=2, **kw
            ).agg(F.sum(F.length("text"))).collect(),
        )

    # --- decontamination: candidate-side shingle stream (the 100 TB
    # side). hashed=True is what ngram_contamination now uses.
    bench = docs.limit(200)
    _timed(
        times,
        "decontam_v2_hashed",
        lambda: ngram_contamination(big, bench, n=4).count(),
    )
    # v1 string replay of the same join
    def _decontam_string():
        c = big.select(
            "doc_id",
            F.explode_outer(token_ngrams(F.col("text"), 4)).alias("_sh"),
        ).filter(F.col("_sh").isNotNull())
        b = (
            bench.select(
                F.col("doc_id").alias("_bid"),
                F.explode_outer(token_ngrams(F.col("text"), 4)).alias("_sh"),
            )
            .filter(F.col("_sh").isNotNull())
            .distinct()
        )
        return (
            c.join(F.broadcast(b), "_sh")
            .groupBy("doc_id")
            .agg(F.countDistinct("_sh"))
            .count()
        )

    _timed(times, "decontam_v1_string", _decontam_string)

    print(json.dumps({"factor": factor, "sf_dir": sf_dir, **times}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
