"""Regression tests for the round-4 VERDICT items 4-7: NULL-aware
stratified sampling, shard-safe sequence manifests, blank-doc shingle
handling in decontamination, and the cheap-scalar layout salt.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.decontam import ngram_contamination, token_ngrams
from polars_text_spark.operators.packing import pack_sequences, sequence_manifest
from polars_text_spark.operators.sampling import stratified_sample
from polars_text_spark.sources.layout import read_partitioned, write_partitioned


# ---------------------------------------------------------------- sampling


def _lang_df(spark):
    rows = [(i, "en") for i in range(20)]
    rows += [(100 + i, "de") for i in range(20)]
    rows += [(200 + i, None) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_null_stratum_kept_at_default_rate_one(spark):
    df = _lang_df(spark)
    out = stratified_sample(df, {"en": 1.0}, "lang", "doc_id", default_rate=1.0)
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("en") == 20
    assert by_lang.get("de") == 20
    # the round-3 bug: NULL-stratum rows were silently dropped here
    assert by_lang.get(None) == 20


def test_null_stratum_sampled_at_fractional_default(spark):
    df = _lang_df(spark)
    out = stratified_sample(df, {"en": 1.0}, "lang", "doc_id", default_rate=0.5)
    null_kept = out.filter(F.col("lang").isNull()).count()
    assert 0 < null_kept < 20  # hash-sampled, not dropped, not all kept


def test_null_stratum_dropped_at_default_zero(spark):
    df = _lang_df(spark)
    out = stratified_sample(df, {"en": 1.0}, "lang", "doc_id", default_rate=0.0)
    assert out.filter(F.col("lang").isNull()).count() == 0


def test_empty_rates_with_default_keeps_everything(spark):
    df = _lang_df(spark)
    out = stratified_sample(df, {}, "lang", "doc_id", default_rate=1.0)
    assert out.count() == 60


def test_empty_rates_without_default_raises(spark):
    with pytest.raises(ValueError, match="empty rates"):
        stratified_sample(_lang_df(spark), {}, "lang", "doc_id")


def test_none_key_in_rates_raises(spark):
    with pytest.raises(ValueError, match="NULL strata"):
        stratified_sample(_lang_df(spark), {None: 1.0}, "lang", "doc_id")


# ----------------------------------------------------------------- packing


def test_manifest_shard_col_disambiguates_seq_ids(spark):
    # Two shards, each long enough to occupy seq_ids 0 and 1 — the
    # old default id_cols dropped the shard, so (doc_id-less) readers
    # saw colliding seq_ids across shards.
    rows = [
        ("a", 1, 6),
        ("a", 2, 6),
        ("b", 3, 6),
        ("b", 4, 6),
    ]
    df = spark.createDataFrame(rows, "shard string, doc_id long, tok long")
    packed = pack_sequences(df, "tok", 8, order_col="doc_id", shard_col="shard")
    man = sequence_manifest(packed, "tok", 8, shard_col="shard")
    assert "shard" in man.columns
    # seq_id is shard-local: both shards use seq 0 and 1, and the
    # (shard, seq_id) key separates them
    got = man.groupBy("shard", "seq_id").agg(
        F.sum("slice_len").alias("filled")
    ).collect()
    filled = {(r["shard"], r["seq_id"]): r["filled"] for r in got}
    assert filled == {
        ("a", 0): 8,
        ("a", 1): 4,
        ("b", 0): 8,
        ("b", 1): 4,
    }
    # slices within each (shard, seq_id) tile without overlap
    slices = man.orderBy("shard", "seq_id", "seq_pos").collect()
    cursor: dict[tuple, int] = {}
    for r in slices:
        key = (r["shard"], r["seq_id"])
        assert r["seq_pos"] == cursor.get(key, 0), r
        cursor[key] = r["seq_pos"] + r["slice_len"]


def test_manifest_shard_col_not_duplicated_when_in_id_cols(spark):
    rows = [("a", 1, 4)]
    df = spark.createDataFrame(rows, "shard string, doc_id long, tok long")
    packed = pack_sequences(df, "tok", 8, order_col="doc_id", shard_col="shard")
    man = sequence_manifest(
        packed, "tok", 8, id_cols=("doc_id", "shard"), shard_col="shard"
    )
    assert man.columns.count("shard") == 1


# ---------------------------------------------------------------- decontam


def test_blank_docs_emit_no_shingles(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "one two")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", token_ngrams(F.col("text"), 4).alias("sh")
    ).collect()
    by_id = {r["doc_id"]: r["sh"] for r in out}
    assert by_id[1] == []
    assert by_id[2] == []
    assert by_id[3] is None  # null text stays null (filtered upstream)
    assert by_id[4] == ["one two"]  # short doc: whole text, one shingle


def test_blank_benchmark_doc_contaminates_nothing(spark):
    cand = spark.createDataFrame(
        [(1, ""), (2, "  \t "), (3, "totally unrelated text here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, ""), (11, "   ")], "doc_id long, text string"
    )
    out = ngram_contamination(cand, bench, "text", "doc_id", n=4)
    assert out.count() == 0


def test_real_overlap_still_detected(spark):
    cand = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "quick brown fox jumps over")], "doc_id long, text string"
    )
    out = ngram_contamination(cand, bench, "text", "doc_id", n=4).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


# ------------------------------------------------------------------ layout


def test_write_partitioned_survives_array_columns(spark, tmp_path):
    # The old all-columns concat_ws salt threw AnalysisException on
    # any frame carrying an array column (e.g. embeddings).
    df = spark.createDataFrame(
        [(1, "en", [0.1, 0.2]), (2, "de", [0.3, 0.4]), (3, "en", [0.5, 0.6])],
        "doc_id long, lang string, embedding array<double>",
    )
    out = str(tmp_path / "docs_with_vec")
    write_partitioned(df, out, ("lang",), files_per_partition=2)
    back = read_partitioned(spark, out)
    assert back.count() == 3
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {1, 2, 3}


def test_write_partitioned_salt_col(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", [float(i)]) for i in range(40)],
        "doc_id long, lang string, embedding array<double>",
    )
    out = str(tmp_path / "docs_salted")
    write_partitioned(df, out, ("lang",), files_per_partition=2, salt_col="doc_id")
    import glob

    for lang in ("en", "de"):
        files = glob.glob(f"{out}/lang={lang}/*.parquet")
        assert 1 <= len(files) <= 2, (lang, files)
    assert read_partitioned(spark, out).count() == 40
