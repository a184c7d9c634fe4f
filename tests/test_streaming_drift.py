"""Windowed KL drift monitor: exact-value check against a hand
computation, drift-direction property, and the stream==batch proof
(chained stateful aggregations, append mode, availableNow)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from polars_text_spark.operators.quality import unigram_frequencies
from polars_text_spark.streaming.drift import windowed_token_drift


def _approx(x):
    return pytest.approx(x, abs=1e-9)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


REF_DOCS = [("the cat sat on the mat",), ("the dog sat",)]
# hour 10 mirrors the reference vocabulary; hour 11 is OOV-heavy spam
STREAM_DOCS = [
    (1, _ts(10, 5), "the cat sat"),
    (2, _ts(10, 40), "the dog sat on the mat"),
    (3, _ts(11, 10), "zzz buy zzz pills zzz now"),
    (4, _ts(11, 30), "the zzz"),
]


def _ref(spark):
    return unigram_frequencies(
        spark.createDataFrame(REF_DOCS, "text string"), "text"
    )


def _docs(spark):
    return spark.createDataFrame(
        STREAM_DOCS, "doc_id long, ts timestamp, text string"
    )


def _py_kl(window_texts: list[str], ref_texts: list[str]) -> float:
    ref: dict[str, int] = {}
    for t in ref_texts:
        for tok in t.lower().split():
            ref[tok] = ref.get(tok, 0) + 1
    den = sum(ref.values()) + len(ref) + 1
    cnt: dict[str, int] = {}
    for t in window_texts:
        for tok in t.lower().split():
            cnt[tok] = cnt.get(tok, 0) + 1
    n = sum(cnt.values())
    kl = 0.0
    for tok, c in cnt.items():
        q = (ref.get(tok, 0) + 1) / den
        kl += (c / n) * math.log((c / n) / q)
    return kl


def test_batch_kl_matches_hand_computation(spark):
    got = {
        r["window_start"].hour: r
        for r in windowed_token_drift(
            _docs(spark), _ref(spark), window="1 hour"
        ).collect()
    }
    texts10 = [t for _, ts, t in STREAM_DOCS if ts.hour == 10]
    texts11 = [t for _, ts, t in STREAM_DOCS if ts.hour == 11]
    ref_texts = [t for (t,) in REF_DOCS]
    assert got[10]["n_tokens"] == 9 and got[11]["n_tokens"] == 8
    assert got[10]["kl_nats"] == _approx(_py_kl(texts10, ref_texts))
    assert got[11]["kl_nats"] == _approx(_py_kl(texts11, ref_texts))
    # the drift DIRECTION: the spammy OOV window diverges far more
    assert got[11]["kl_nats"] > got[10]["kl_nats"] + 0.5


def test_stream_matches_batch_under_available_now(spark, tmp_path):
    docs = _docs(spark)
    ref = _ref(spark)
    batch = windowed_token_drift(docs, ref, window="1 hour").collect()

    # sentinel far-future doc: advances the final watermark past every
    # real window so append mode emits them; its own (never-closed)
    # window is excluded from the comparison
    sentinel = spark.createDataFrame(
        [(99, _ts(23, 0), "flush")], "doc_id long, ts timestamp, text string"
    )
    # Arrival order must FOLLOW event time, deterministically. The old
    # `union(sentinel).repartition(3)` scattered rows into part files
    # whose modification times race (parallel writers); the file
    # source ingests by mod time, so whenever the sentinel's file
    # landed early the watermark jumped to 22:30 and the remaining
    # hour-10/11 rows were dropped as late — CORRECT watermark
    # semantics, flaky test. Write hour-10, hour-11, sentinel as three
    # sequential single files with forced ascending mtimes instead.
    import os
    import time as _time

    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    base = _time.time()

    def _drop(df, name, mtime):
        sub = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(sub))
        part = next(sub.glob("part-*.parquet"))
        target = drop_dir / f"{name}.parquet"
        part.rename(target)
        os.utime(target, (mtime, mtime))

    _drop(docs.filter("ts < timestamp '2024-01-01 11:00:00'"), "h10", base)
    _drop(
        docs.filter("ts >= timestamp '2024-01-01 11:00:00'"),
        "h11",
        base + 60,
    )
    _drop(sentinel, "flush", base + 120)

    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop_dir))
    )
    agg = windowed_token_drift(
        stream, ref, window="1 hour", watermark="30 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tok_drift")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # generous bound: under full-suite contention (32 tests sharing
    # the executor threads) 120 s has been observed to lapse, and a
    # lapsed wait silently truncates the memory sink into a bogus
    # mismatch — assert termination so a timeout fails as a timeout
    assert q.awaitTermination(600), "drift stream did not finish in 600s"
    got = spark.sql(
        "SELECT * FROM tok_drift WHERE window_start < timestamp '2024-01-01 23:00:00'"
    ).collect()

    def key(rows):
        return sorted(
            (
                r["window_start"],
                r["n_tokens"],
                r["n_distinct"],
                round(r["kl_nats"], 9),
            )
            for r in rows
        )

    assert key(got) == key(batch)


def test_reference_join_is_broadcast_and_no_udf(spark):
    from polars_text_spark.plans.explain import explain_str

    plan = explain_str(
        windowed_token_drift(_docs(spark), _ref(spark)), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
