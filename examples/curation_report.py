"""Corpus curation & linguistics REPORT — the round-7 audit surface.

Runs at sf0.001 in ~1 min:

    python examples/curation_report.py [sf_dir]

Sections: corpus-health fits (Heaps/Zipf) -> sketch calibration
(HLL / CMS / GK) -> char/readability quality -> dispersion &
collocations -> novelty + outliers -> dup provenance & degree ->
snapshot diff -> split + leakage audit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import polars_text_spark as pts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pts.get_spark("curation-report")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )

    from polars_text_spark.functions.analysis import (
        char_class_ratios,
        char_entropy,
        readability,
    )
    from polars_text_spark.operators.dedup import (
        dup_degree_histogram,
        minhash_lsh_pairs,
        near_dup_source_matrix,
    )
    from polars_text_spark.operators.linguistics import (
        collocations,
        dispersion,
        ngram_counts,
    )
    from polars_text_spark.operators.quality import (
        cardinality_report,
        doc_ngram_novelty,
        heaps_law_fit,
        heavy_hitters_audit,
        length_outlier_report,
        quantile_sketch_audit,
        zipf_slope_by,
    )
    from polars_text_spark.operators.snapshots import snapshot_diff
    from polars_text_spark.operators.splits import assign_splits, split_leakage

    print("== 1. corpus-health fits ==")
    heaps_law_fit(docs).show()
    zipf_slope_by(docs, "text").show()

    print("== 2. sketch calibration (HLL / CMS / GK) ==")
    from polars_text_spark.functions.analysis import doc_fingerprint

    cardinality_report(docs, "source", doc_fingerprint("text")).show(5)
    heavy_hitters_audit(docs, "text", k=5).show()
    quantile_sketch_audit(docs, "source", "n_chars").show(5)

    print("== 3. char + readability quality ==")
    r = readability("text")
    docs.select(
        F.round(F.avg(char_entropy("text")), 3).alias("avg_entropy"),
        F.round(F.avg(char_class_ratios("text")["space_ratio"]), 3).alias(
            "avg_space_ratio"
        ),
        F.round(F.avg(r["flesch"]), 1).alias("avg_flesch"),
        F.round(F.avg(r["fk_grade"]), 1).alias("avg_fk_grade"),
    ).show()

    print("== 4. dispersion + collocations + n-grams ==")
    dispersion(docs, "source", min_count=5).orderBy(F.desc("dp_norm")).show(5)
    collocations(docs, window=2, min_pair_count=3).orderBy(
        F.desc("log_dice")
    ).show(5)
    ngram_counts(docs, n=3, min_count=3).orderBy(F.desc("count")).show(
        5, truncate=False
    )

    print("== 5. novelty + length outliers ==")
    doc_ngram_novelty(docs).orderBy("novelty").show(5)
    length_outlier_report(docs, "source", "n_chars").show(5)

    print("== 6. dup provenance + degree shape ==")
    # band-bucket audit FIRST: would this corpus blow up the candidate
    # join? (saturated buckets route to hub stars under band_cap)
    from polars_text_spark.operators.dedup import lsh_band_stats

    lsh_band_stats(docs, "text", "doc_id", band_cap=1000).show()
    # the expensive shingle/minhash/band-join DAG is consumed by three
    # sections — pin it once instead of recomputing per consumer
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", jaccard_threshold=0.9).persist()
    near_dup_source_matrix(docs, pairs=pairs).show(5)
    dup_degree_histogram(pairs).orderBy("degree").show()

    print("== 7. snapshot diff (synthesized v2) ==")
    v2 = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    ).where(F.col("doc_id") % 10 != 3)
    snapshot_diff(docs, v2).groupBy("status").count().show()

    print("== 8. split + near-dup leakage audit ==")
    split = assign_splits(
        docs, "doc_id", {"val": 0.05, "test": 0.05, "train": 0.9}
    )
    leak = split_leakage(split, pairs)
    leak.groupBy("split", "contaminated").count().orderBy("split").show()
    pairs.unpersist()


if __name__ == "__main__":
    main()
