"""Data-selection pipeline DEMO — the round-9 curation additions
composed end to end the way a pretraining-data run uses them.

Runs at sf0.001 in ~1 min:

    python examples/data_selection.py [sf_dir]

Flow: DSIR fit on a target slice -> per-doc importance weights ->
expectation-mode resample -> perceptual (dHash) media near-dup sweep
-> token-budget epoch plan + materialization -> windowed drift check
of the selected corpus against the target reference.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import polars_text_spark as pts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pts.get_spark("data-selection-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )

    # 1. DSIR: fit raw-vs-target hashed-ngram model, weigh, resample
    target = docs.filter(F.col("lang") == "en")
    ratio = pts.dsir_fit(docs, target, buckets=4096)
    weights = pts.dsir_log_weights(docs, ratio, buckets=4096)
    selected = pts.dsir_sample(docs, weights, beta=4.0, salt="demo")
    print("== DSIR selection ==")
    print(f"raw docs: {docs.count()}, selected: {selected.count()}")
    selected.groupBy("lang").count().orderBy("lang").show()

    # 2. perceptual media dedup (stub byte-grid backend — swap
    #    backend='pillow' for real pixel decode when installed)
    media = selected.select(
        "doc_id", F.encode("text", "UTF-8").alias("media")
    )
    pairs = pts.dhash_pairs(media, "media", "doc_id", max_hamming=3)
    print("== dHash near-dup pairs (on selected docs) ==")
    pairs.orderBy("id_a", "id_b").show(5)

    # 3. token-budget epoch mixing over the surviving mixture
    counts = {
        r[0]: r[1]
        for r in selected.groupBy("lang").count().collect()
        if r[0] is not None
    }
    budget = int(1.2 * sum(counts.values()))
    plan = pts.epoch_plan(
        counts,
        {lang: 1.0 / len(counts) for lang in counts},
        budget,
        max_epochs=3.0,
    )
    print("== epoch plan ==")
    for lang, r in sorted(plan.items()):
        print(f"  {lang}: {r:.3f} epochs over {counts[lang]} docs")
    epoched = pts.apply_epoch_plan(selected, plan, "lang", "doc_id")
    print(f"materialized rows: {epoched.count()} (budget {budget})")

    # 4. drift check: selected corpus vs the target reference, over
    #    synthetic hourly windows (streaming twin: streaming/drift.py)
    from polars_text_spark.operators.quality import unigram_frequencies
    from polars_text_spark.streaming import windowed_token_drift

    timed = selected.withColumn(
        "ts",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval("
            "0, 0, 0, 0, 0, CAST(doc_id % 120 AS INT), 0)"
        ),
    )
    ref = unigram_frequencies(target, "text")
    print("== windowed drift vs target reference ==")
    windowed_token_drift(timed, ref, window="1 hour").orderBy(
        "window_start"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
