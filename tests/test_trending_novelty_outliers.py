"""Round-7 batch 4: trending keys (stream==batch), n-gram novelty,
length outliers, dup-degree histogram."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.dedup import dup_degree_histogram
from polars_text_spark.operators.quality import (
    doc_ngram_novelty,
    length_outlier_report,
)
from polars_text_spark.sources.catalog import load_events
from polars_text_spark.streaming.events import (
    read_events_stream,
    topk_per_window,
    windowed_key_counts,
)


def test_trending_stream_matches_batch(spark, sf_dir, tmp_path):
    """windowed_key_counts on a file-source stream == the batch run;
    topk_per_window applied to the streamed counts == batch top-k."""
    events = load_events(spark, sf_dir).where(F.col("props").isNotNull())
    key = F.get_json_object("props", "$.k").cast("long")
    batch_counts = windowed_key_counts(events, key, window="1 hour")
    batch_top = {
        (r["window_start"], r["key"], r["n_events"], r["rank"])
        for r in topk_per_window(batch_counts, k=3).collect()
    }

    drop_dir = tmp_path / "drops"
    events.repartition(3).write.parquet(str(drop_dir))
    stream = read_events_stream(spark, str(drop_dir), max_files_per_trigger=2)
    agg = windowed_key_counts(
        stream.where(F.col("props").isNotNull()), key, window="1 hour"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("trend_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = spark.sql("SELECT * FROM trend_counts")
    stream_top = {
        (r["window_start"], r["key"], r["n_events"], r["rank"])
        for r in topk_per_window(streamed, k=3).collect()
    }
    assert stream_top == batch_top and stream_top


def test_topk_per_window_tie_break(spark):
    rows = [
        ("2025-01-01 00:00:00", 1, 5),
        ("2025-01-01 00:00:00", 2, 5),
        ("2025-01-01 00:00:00", 3, 9),
        ("2025-01-01 01:00:00", 7, 1),
    ]
    df = spark.createDataFrame(
        rows, "window_start string, key long, n_events long"
    )
    got = {
        (r["window_start"], r["rank"]): r["key"]
        for r in topk_per_window(df, k=2).collect()
    }
    assert got == {
        ("2025-01-01 00:00:00", 1): 3,
        ("2025-01-01 00:00:00", 2): 1,  # count tie -> smaller key first
        ("2025-01-01 01:00:00", 1): 7,
    }
    with pytest.raises(ValueError):
        topk_per_window(df, k=0)


def test_doc_ngram_novelty_hand_computed(spark):
    rows = [
        (1, "a b c d"),      # trigrams: "a b c", "b c d"
        (2, "a b c x"),      # trigrams: "a b c", "b c x"
        (3, "zz"),           # too short: absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in doc_ngram_novelty(df, n=3).collect()}
    assert set(got) == {1, 2}
    # "a b c" shared (df=2); the other gram of each doc is unique
    assert (got[1]["n_grams"], got[1]["n_novel"]) == (2, 1)
    assert got[1]["novelty"] == pytest.approx(0.5)
    assert (got[2]["n_grams"], got[2]["n_novel"]) == (2, 1)
    # repeated gram inside one doc counts once (distinct per doc)
    df2 = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    r2 = doc_ngram_novelty(df2, n=2).collect()[0]
    assert r2["n_grams"] == 2  # "a b", "b a"
    assert r2["novelty"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        doc_ngram_novelty(df, n=0)


def test_length_outlier_report(spark):
    # group "s": lengths 10,10,10,10,1000 -> q1=10, q3=10, iqr=0,
    # fences both 10 -> one high outlier
    rows = [("s", n) for n in (10, 10, 10, 10, 1000)] + [("t", 5)]
    df = spark.createDataFrame(rows, "source string, n long")
    got = {r["source"]: r for r in length_outlier_report(df, "source", "n").collect()}
    s = got["s"]
    assert (s["n_docs"], s["q1"], s["q3"]) == (5, 10.0, 10.0)
    assert (s["n_low"], s["n_high"]) == (0, 1)
    t = got["t"]
    assert (t["n_docs"], t["n_low"], t["n_high"]) == (1, 0, 0)


def test_dup_degree_histogram(spark):
    # star: 1-2, 1-3, 1-4  => doc 1 degree 3, docs 2/3/4 degree 1
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {r["degree"]: r["n_docs"] for r in dup_degree_histogram(pairs).collect()}
    assert got == {3: 1, 1: 3}
