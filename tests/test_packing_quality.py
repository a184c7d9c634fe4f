"""Sequence packing + unigram surprisal: placement math on known
streams; surprisal against hand-computed distributions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.packing import (
    pack_sequences,
    sequence_manifest,
)
from polars_text_spark.operators.quality import (
    unigram_frequencies,
    unigram_surprisal,
)


def test_pack_single_stream(spark):
    # Stream: 4, 5, 3, 10 tokens; budget 8.
    docs = spark.createDataFrame(
        [(1, 4), (2, 5), (3, 3), (4, 10)], "doc_id long, tok long"
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, "tok", 8, order_col="doc_id").collect()
    }
    # doc1: [0,4)   -> seq 0 only
    assert (out[1].stream_start, out[1].first_seq, out[1].last_seq) == (0, 0, 0)
    assert (out[1].n_seqs, out[1].seq_offset) == (1, 0)
    # doc2: [4,9)   -> crosses seq 0/1 boundary
    assert (out[2].first_seq, out[2].last_seq, out[2].n_seqs) == (0, 1, 2)
    assert out[2].seq_offset == 4
    # doc3: [9,12)  -> seq 1
    assert (out[3].first_seq, out[3].last_seq, out[3].n_seqs) == (1, 1, 1)
    # doc4: [12,22) -> seqs 1..2
    assert (out[4].first_seq, out[4].last_seq, out[4].n_seqs) == (1, 2, 2)
    assert out[4].seq_offset == 4


def test_pack_sharded_streams_independent(spark):
    docs = spark.createDataFrame(
        [(1, "a", 6), (2, "b", 6), (3, "a", 6), (4, "b", 6)],
        "doc_id long, shard string, tok long",
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(
            docs, "tok", 8, order_col="doc_id", shard_col="shard"
        ).collect()
    }
    # Each shard restarts its stream at 0.
    assert out[1].stream_start == 0 and out[2].stream_start == 0
    assert out[3].stream_start == 6 and out[4].stream_start == 6
    assert out[3].n_seqs == 2  # [6,12) crosses the shard-local boundary


def test_pack_zero_token_doc(spark):
    docs = spark.createDataFrame(
        [(1, 8), (2, 0), (3, 4)], "doc_id long, tok long"
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, "tok", 8, order_col="doc_id").collect()
    }
    assert (out[2].n_seqs, out[2].first_seq, out[2].last_seq) == (0, 1, 1)
    assert out[3].stream_start == 8  # empty doc consumed no stream


def test_pack_budget_validation(spark):
    docs = spark.createDataFrame([(1, 4)], "doc_id long, tok long")
    with pytest.raises(ValueError):
        pack_sequences(docs, "tok", 0, order_col="doc_id")


def test_sequence_manifest_slices(spark):
    docs = spark.createDataFrame(
        [(1, 4), (2, 5), (3, 3), (4, 10), (5, 0)], "doc_id long, tok long"
    )
    packed = pack_sequences(docs, "tok", 8, order_col="doc_id")
    man = sequence_manifest(packed, "tok", 8).collect()
    got = sorted((r.doc_id, r.seq_id, r.seq_pos, r.doc_tok_start, r.slice_len)
                 for r in man)
    assert got == [
        (1, 0, 0, 0, 4),
        (2, 0, 4, 0, 4), (2, 1, 0, 4, 1),
        (3, 1, 1, 0, 3),
        (4, 1, 4, 0, 4), (4, 2, 0, 4, 6),
    ]  # doc5 (0 tokens) emits nothing
    # invariants: slices cover each doc exactly; no sequence overflows
    by_doc = {}
    by_seq = {}
    for d, s, _, _, ln in got:
        by_doc[d] = by_doc.get(d, 0) + ln
        by_seq[s] = by_seq.get(s, 0) + ln
    assert by_doc == {1: 4, 2: 5, 3: 3, 4: 10}
    assert all(v <= 8 for v in by_seq.values())
    # every fully-interior sequence is exactly full
    assert by_seq[0] == 8 and by_seq[1] == 8


def test_unigram_surprisal_self(spark):
    # Corpus: "a a b" / "b" -> counts a:2 b:2, total 4; p=0.5 each.
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_surprisal(docs).collect()}
    assert out[1].n_tokens == 3 and out[2].n_tokens == 1
    assert out[1].avg_surprisal == pytest.approx(1.0)
    assert out[2].avg_surprisal == pytest.approx(1.0)


def test_unigram_surprisal_external_freq_with_smoothing(spark):
    ref = spark.createDataFrame(
        [(1, "x x x y")], "doc_id long, text string"
    )
    freq = unigram_frequencies(ref)  # x:3 y:1, total 4
    docs = spark.createDataFrame(
        [(1, "x y z")], "doc_id long, text string"
    )
    out = unigram_surprisal(docs, freq_df=freq).collect()[0]
    # z unseen -> +1-smoothed count over the SAME total: -log2(1/4).
    expect = (-math.log2(3 / 4) - math.log2(1 / 4) - math.log2(1 / 4)) / 3
    assert out.avg_surprisal == pytest.approx(expect)


def test_unigram_frequencies_counts(spark):
    docs = spark.createDataFrame(
        [(1, "  Foo  bar FOO "), (2, None)], "doc_id long, text string"
    )
    got = {r.token: r.cnt for r in unigram_frequencies(docs).collect()}
    assert got == {"foo": 2, "bar": 1}
