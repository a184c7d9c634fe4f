"""End-to-end demo: the training-data pipeline this engine is built for.

Runs at sf0.001 in ~1 min on a laptop-class machine:

    python examples/pipeline_demo.py [sf_dir]

Stages: profile -> clean/normalize -> quality filter -> exact dedup ->
near-dedup (MinHash+LSH) -> tokenize -> corpus statistics -> topics.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import polars_text_spark as pts
from polars_text_spark import functions as T


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pts.get_spark("pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== 1. profile ==")
    docs.select(
        T.detect_language("text"),
        T.word_count("text"),
        T.quality_score("text"),
    ).groupBy("lang_detected").agg(
        F.count("*").alias("docs"),
        F.sum("word_count").alias("words"),
        F.round(F.avg("quality_score"), 3).alias("avg_quality"),
    ).show()

    print("== 2. clean + quality filter ==")
    cleaned = docs.select(
        "doc_id", T.normalize_text("text").alias("text"), T.quality_score("text")
    ).filter(F.col("quality_score") >= 0.5)
    print(f"kept {cleaned.count()} / {docs.count()} docs")

    print("== 2a. rule-tagger filtering (Gopher-style tags) ==")
    tagged = pts.with_gopher_tags(cleaned, "text", min_tokens=5)
    tagged.agg(
        *[
            F.sum(F.col(c).cast("int")).alias(c)
            for c in tagged.columns
            if c.startswith("rule_") or c == "keep"
        ]
    ).show()
    cleaned = tagged.filter("keep").drop(
        *[c for c in tagged.columns if c.startswith("rule_")], "keep"
    )

    print("== 2b. PII redaction ==")
    cleaned = cleaned.withColumn("text", pts.redact_pii("text"))
    n_pii = cleaned.filter(F.col("text").contains("[EMAIL]")).count()
    print(f"docs with redacted emails: {n_pii}")

    print("== 3. exact dedup ==")
    deduped = pts.exact_dedup(cleaned, "text", "doc_id")
    print(f"after exact dedup: {deduped.count()} docs")

    print("== 3b. boilerplate signal (paragraph-level dedup) ==")
    para = pts.chunk_dup_stats(deduped, "text", "doc_id", sep="\n\n")
    deduped = deduped.join(
        para.select("doc_id", "dup_chunk_frac"), "doc_id", "left"
    ).filter(
        F.coalesce(F.col("dup_chunk_frac"), F.lit(0.0)) <= 0.9
    ).drop("dup_chunk_frac")
    print(f"after dropping >90%-boilerplate docs: {deduped.count()} docs")

    print("== 3c. duplicated-span coverage + removal (Lee et al.) ==")
    spans = pts.dup_ngram_coverage(deduped, "text", "doc_id", n=5, min_df=2)
    n_dirty = spans.filter("dup_frac > 0.2").count()
    print(f"docs with >20% duplicated-span coverage: {n_dirty}")
    deduped = pts.strip_duplicate_spans(
        deduped.select("doc_id", "text"), "text", "doc_id", n=5, min_df=2
    ).join(deduped.drop("text"), "doc_id")

    print("== 4. near-dedup: pairs -> families -> canonical keep ==")
    pairs = pts.minhash_lsh_pairs(deduped, "text", "doc_id", jaccard_threshold=0.9)
    clustered = pts.duplicate_clusters(
        deduped, pairs.select("id_a", "id_b"), "doc_id",
        prefer_col="quality_score",
    )
    final = clustered.filter("is_canonical").drop(
        "component", "cluster_size", "is_canonical"
    )
    print(f"near-dup pairs: {pairs.count()}; final corpus: {final.count()} docs")

    print("== 4b. benchmark decontamination ==")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    contaminated = pts.ngram_contamination(final, bench, "text", "doc_id", n=4)
    drop_ids = contaminated.select("doc_id")
    final = final.join(drop_ids, "doc_id", "left_anti")
    print(f"dropped {drop_ids.count()} contaminated docs; {final.count()} remain")

    print("== 4c. deterministic language rebalancing ==")
    final = final.join(docs.select("doc_id", "lang"), "doc_id")
    final = pts.stratified_sample(
        final, {"en": 0.8}, "lang", "doc_id", default_rate=1.0
    )
    final.groupBy("lang").count().orderBy("lang").show()

    print("== 4d. corpus-relative quality (unigram surprisal) ==")
    scored = pts.unigram_surprisal(final, "text", "doc_id")
    final = final.join(scored, "doc_id", "left")
    lo, hi = final.approxQuantile("avg_surprisal", [0.02, 0.98], 0.01)
    final = final.filter(F.col("avg_surprisal").between(lo, hi)).drop(
        "n_tokens", "avg_surprisal"
    )
    print(f"kept docs inside the [{lo:.2f}, {hi:.2f}]-bit surprisal band:"
          f" {final.count()}")

    print("== 4d2. bigram-LM coherence scoring ==")
    bg = pts.bigram_surprisal(final, "text", "doc_id")
    bg.agg(
        F.round(F.avg("avg_surprisal"), 2).alias("mean_bits"),
        F.round(F.max("avg_surprisal"), 2).alias("max_bits"),
    ).show()

    print("== 4d3. semantic dedup over embeddings (SemDeDup) ==")
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sem_pairs = pts.semantic_dup_pairs(
        vecs, "embedding", "vec_id", k=8, iterations=2, tau=0.4
    )
    print(f"within-cluster cosine>=0.4 pairs: {sem_pairs.count()}")

    print("== 4d4. containment near-dups (quote/wrapper shape) ==")
    cont = pts.containment_pairs(
        final, "text", "doc_id", block_cols=("lang",), threshold=0.5
    )
    print(f"max-containment>=0.5 pairs: {cont.count()}")

    print("== 4f. quality-weighted downsample + FIM augmentation ==")
    kept = pts.weighted_sample(
        final,
        F.size(T.ws_token_array("text")) / F.lit(200.0),
        "doc_id",
        salt="demo",
    )
    fimmed = pts.fim_transform(kept, "text", "doc_id", fim_rate=0.5)
    fimmed.agg(
        F.count("*").alias("kept_docs"),
        F.sum(F.col("fim_applied").cast("int")).alias("fim_rewritten"),
    ).show()

    print("== 4e. pack into 512-token training sequences ==")
    counted = final.withColumn(
        "n_tok",
        F.size(F.filter(F.split(F.trim(F.lower("text")), r"\s+"),
                        lambda t: t != "")),
    )
    packed = pts.pack_sequences(
        counted, "n_tok", 512, order_col="doc_id", shard_col="lang"
    )
    manifest = pts.sequence_manifest(packed, "n_tok", 512,
                                     shard_col="lang")
    manifest.groupBy("lang").agg(
        F.countDistinct("seq_id").alias("sequences"),
        F.sum("slice_len").alias("tokens"),
    ).orderBy("lang").show()

    print("== 5. top tokens after stopword removal ==")
    toks = final.select(
        F.explode(
            T.remove_stopwords(
                T.tokenize("text", model="native:plain_words_en"),
                "en",
                field="token",
            )
        ).alias("t")
    )
    toks.groupBy(F.col("t.token").alias("token")).count().orderBy(
        F.desc("count")
    ).show(10)

    print("== 6. topics ==")
    topics = pts.topic_modeling(final, "text", min_cluster_size=10, top_k=5)
    topics.filter(F.col("topics.dominant_topic") >= 0).groupBy(
        "topics.dominant_topic"
    ).agg(
        F.count("*").alias("docs"),
        F.first("topics.representative_words").alias("top_words"),
    ).show(truncate=False)


if __name__ == "__main__":
    main()
