"""JSONL / CSV / text-tree ingestion round-trips and corrupt-line audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.sources.io import (
    CORRUPT_COL,
    read_csv_docs,
    read_jsonl,
    read_text_tree,
    write_jsonl,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _key_set(df):
    return {
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.select("doc_id", "text", "lang", "source", "n_chars").collect()
    }


def test_jsonl_round_trip_gzip(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs.repartition(3), out)
    back = read_jsonl(spark, out).persist()  # cache: Spark disallows
    # corrupt-record-only queries on the raw file scan
    assert _key_set(back) == _key_set(docs)
    # no corrupt rows on a clean write
    assert back.where(F.col(CORRUPT_COL).isNotNull()).count() == 0
    back.unpersist()


def test_jsonl_corrupt_lines_audited_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    df = read_jsonl(spark, str(p)).persist()
    good = df.where(F.col(CORRUPT_COL).isNull())
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 1
    assert "NOT JSON" in bad.collect()[0][CORRUPT_COL]
    df.unpersist()


def test_csv_round_trip_with_embedded_newlines(spark, tmp_path):
    rows = [
        (1, "plain text", "en", "s", 10),
        (2, 'quoted "text"\nwith newline', "en", "s", 25),
        (3, None, "de", "t", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "corpus_csv")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .csv(out)
    )
    back = read_csv_docs(spark, out, multiline=True)
    assert _key_set(back) == _key_set(df)


def test_text_tree_one_doc_per_file(spark, tmp_path):
    d = tmp_path / "tree"
    d.mkdir()
    (d / "a.txt").write_text("first document body")
    (d / "b.txt").write_text("second\nmultiline\nbody")
    df = read_text_tree(spark, str(d))
    got = {r["path"].rsplit("/", 1)[-1]: r["text"] for r in df.collect()}
    assert got == {
        "a.txt": "first document body",
        "b.txt": "second\nmultiline\nbody",
    }
