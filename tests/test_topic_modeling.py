"""Topic-modeling tests: unit tests on the deterministic stages
(chunking/ctfidf/cluster — the reference's CI policy, mod.rs:21-24)
plus structural invariants of the full pipeline (FIXTURES.md F6)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.topic_modeling.chunking import (
    chunk_document,
    split_paragraphs,
    split_sentences,
)
from polars_text_spark.operators.topic_modeling.cluster import cluster
from polars_text_spark.operators.topic_modeling.ctfidf import ctfidf_scores
from polars_text_spark.operators.topic_modeling.reduce import reduce_embeddings
from polars_text_spark.operators.topic_modeling import topic_modeling


# ---- chunking (golden behaviors from chunking.rs tests) -------------------


def test_chunking_empty_and_null():
    assert chunk_document(None) == []
    assert chunk_document("") == []
    assert chunk_document("   \n  ") == []


def test_chunking_short_doc_single_chunk():
    assert chunk_document("hello world") == ["hello world"]


def test_chunking_budget_and_overlap():
    # 15 two-word sentences -> 2-token units; budget 10, overlap 3
    # (carried at unit granularity: last two sentences = 4 tokens).
    words = [f"w{i}" for i in range(30)]
    doc = ". ".join(" ".join(words[i : i + 2]) for i in range(0, 30, 2)) + "."
    chunks = chunk_document(doc, max_tokens=10, overlap=3)
    assert len(chunks) >= 3
    for c in chunks:
        assert len(c.split()) <= 10
    # overlap: the next chunk starts with the previous chunk's suffix
    first, second = chunks[0].split(), chunks[1].split()
    assert first[-4:] == second[:4]
    # every source word appears somewhere
    joined = {w.rstrip(".") for c in chunks for w in c.split()}
    assert joined == set(words)


def test_chunking_units_at_budget_carry_no_overlap():
    # Units as large as the budget leave no room for an overlap suffix
    # (overlap_suffix aborts when tokens + unit >= max_tokens) — same
    # behavior as the reference's unit-granularity overlap.
    doc = " ".join(f"w{i}" for i in range(30))
    chunks = chunk_document(doc, max_tokens=10, overlap=3)
    assert [len(c.split()) for c in chunks] == [10, 10, 10]


def test_chunking_paragraph_and_sentence_fallback():
    para_a = "alpha beta. gamma delta."
    para_b = "epsilon zeta eta theta iota kappa"
    doc = f"{para_a}\n\n{para_b}"
    # budget smaller than a paragraph -> sentence split kicks in
    chunks = chunk_document(doc, max_tokens=4, overlap=0)
    assert any("alpha beta." in c for c in chunks)
    # single word longer than budget falls back to char packing
    chunks = chunk_document("abcdefghij", max_tokens=3, overlap=0)
    assert "".join(chunks).replace(" ", "") == "abcdefghij"


def test_split_helpers():
    assert split_paragraphs("a\nb\n\nc") == ["a\nb", "c"]
    assert split_sentences("One. Two? Three") == ["One.", "Two?", "Three"]


# ---- reduce / cluster -----------------------------------------------------


def test_reduce_guard_and_shape():
    with pytest.raises(ValueError):
        reduce_embeddings(np.zeros((5, 8)), dims=3)
    rng = np.random.default_rng(0)
    m = rng.standard_normal((30, 8)).astype(np.float32)
    red = reduce_embeddings(m, dims=3, seed=42)
    assert red.shape == (30, 3)
    # deterministic
    assert np.allclose(red, reduce_embeddings(m, dims=3, seed=42))


def test_cluster_blobs_and_outlier():
    rng = np.random.default_rng(1)
    blob_a = rng.normal(0.0, 0.05, (20, 3))
    blob_b = rng.normal(5.0, 0.05, (20, 3))
    outlier = np.array([[50.0, 50.0, 50.0]])
    pts = np.vstack([blob_a, blob_b, outlier])
    labels, n_topics = cluster(pts, min_cluster_size=10)
    assert n_topics == 2
    assert labels[40] == -1  # far point is noise
    assert len(set(labels[:20])) == 1 and len(set(labels[20:40])) == 1
    assert set(labels[:40]) == {0, 1}  # contiguous from 0


def test_cluster_trivial_cases():
    labels, n = cluster(np.zeros((0, 2)))
    assert len(labels) == 0 and n == 0
    labels, n = cluster(np.zeros((1, 2)))
    assert list(labels) == [0] and n == 1
    # one uniform blob -> a single topic, no fragmentation
    rng = np.random.default_rng(2)
    labels, n = cluster(rng.normal(0, 1.0, (40, 3)), min_cluster_size=10)
    assert n == 1 and set(labels) == {0}


# ---- c-TF-IDF (golden ranking properties, ctfidf.rs:138-179) --------------


def test_ctfidf_distinctive_terms_win():
    topics = [
        {"common": 10, "apple": 8, "fruit": 3},
        {"common": 10, "engine": 9, "piston": 4},
    ]
    scored = ctfidf_scores(topics, top_k=2)
    assert scored[0][0][0] == "apple"
    assert scored[1][0][0] == "engine"
    # ubiquitous term scores below distinctive terms in both topics
    for topic in scored:
        assert "common" not in [t for t, _ in topic[:1]]


def test_ctfidf_tie_break_alphabetical():
    topics = [{"b": 5, "a": 5}]
    scored = ctfidf_scores(topics, top_k=2)
    assert [t for t, _ in scored[0]] == ["a", "b"]


def test_ctfidf_empty():
    assert ctfidf_scores([], top_k=5) == []
    assert ctfidf_scores([{}], top_k=5) == [[]]


# ---- full pipeline: structural invariants ---------------------------------


@pytest.fixture(scope="module")
def topic_corpus(spark):
    """Two clearly separable themes x 20 docs + outlier + empty + null
    (FIXTURES.md F6)."""
    fruit_words = ["apple", "banana", "cherry", "mango", "grape", "melon"]
    engine_words = ["engine", "piston", "turbine", "valve", "gear", "clutch"]
    rows = []
    for i in range(20):
        rows.append((i, " ".join(fruit_words[j % 6] for j in range(i, i + 12))))
    for i in range(20, 40):
        rows.append((i, " ".join(engine_words[j % 6] for j in range(i, i + 12))))
    rows.append((40, "zzz qqq xxx vvv kkk unrelated outlier gibberish"))
    rows.append((41, ""))
    rows.append((42, None))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_topic_modeling_structure(spark, topic_corpus):
    out = topic_modeling(
        topic_corpus, "text", min_cluster_size=10, seed=42, top_k=5
    ).cache()
    rows = {r.doc_id: r.topics for r in out.collect()}

    # 1:1 rows, stable schema
    assert len(rows) == 43
    t0 = rows[0]
    assert set(t0.asDict()) == {
        "dominant_topic",
        "topic_distribution",
        "representative_words",
        "x",
        "y",
        "n_topics",
        "n_chunks",
        "stage_timings_ms",
    }

    # empty/null docs -> dominant -1, empty distribution/words
    for doc_id in (41, 42):
        t = rows[doc_id]
        assert t.dominant_topic == -1
        assert t.topic_distribution == [] and t.representative_words == []
        assert (t.x, t.y) == (0.0, 0.0)

    # run-level metadata replicated on every row
    n_topics = {t.n_topics for t in rows.values()}
    n_chunks = {t.n_chunks for t in rows.values()}
    assert len(n_topics) == 1 and len(n_chunks) == 1
    assert n_topics.pop() == 2  # two separable themes
    assert n_chunks.pop() == 41  # one chunk per non-empty doc

    # the two themes land in different topics, consistently
    fruit_topics = {rows[i].dominant_topic for i in range(20)}
    engine_topics = {rows[i].dominant_topic for i in range(20, 40)}
    assert len(fruit_topics) == 1 and len(engine_topics) == 1
    assert fruit_topics != engine_topics
    assert fruit_topics.pop() >= 0 and engine_topics.pop() >= 0

    # distributions sum to 1 over each doc's chunks, ascending ids
    for doc_id in range(40):
        dist = rows[doc_id].topic_distribution
        assert math.isclose(sum(p.proportion for p in dist), 1.0, rel_tol=1e-6)
        ids = [p.topic_id for p in dist]
        assert ids == sorted(ids)

    # representative words match the theme vocabulary
    fruit_words = set(rows[0].representative_words)
    assert fruit_words & {"apple", "banana", "cherry", "mango", "grape", "melon"}
    engine_words = set(rows[20].representative_words)
    assert engine_words & {"engine", "piston", "turbine", "valve", "gear", "clutch"}
    assert not (fruit_words & engine_words)

    # stage timings carry the reference's stage names incl. total
    stages = [s.stage for s in rows[0].stage_timings_ms]
    assert stages[0] == "embedder_load" and stages[-1] == "total"
    assert "hdbscan" in stages and "rollup" in stages

    # group_by(dominant_topic) recovers the topic table (plugin.rs:10-28)
    recovered = (
        out.filter(F.col("topics.dominant_topic") >= 0)
        .groupBy("topics.dominant_topic")
        .agg(F.first("topics.representative_words").alias("words"))
        .count()
    )
    assert recovered == 2


def test_topic_modeling_sampled_fit_path(spark, topic_corpus):
    """max_fit_points below the corpus size forces the sampled-fit
    scale path; the two themes must still separate and every chunk
    still gets a label (fit or nearest-centroid assignment)."""
    out = topic_modeling(
        topic_corpus,
        "text",
        min_cluster_size=8,
        seed=42,
        top_k=5,
        max_fit_points=30,  # < 41 chunks -> sampled fit
    )
    rows = {r.doc_id: r.topics for r in out.collect()}
    assert len(rows) == 43
    fruit = {rows[i].dominant_topic for i in range(20)}
    engine = {rows[i].dominant_topic for i in range(20, 40)}
    assert fruit != engine and len(fruit) == 1 and len(engine) == 1
    assert fruit.pop() >= 0 and engine.pop() >= 0
    for doc_id in range(40):
        dist = rows[doc_id].topic_distribution
        assert math.isclose(sum(p.proportion for p in dist), 1.0, rel_tol=1e-6)


def test_assign_to_clusters_unit():
    from polars_text_spark.operators.topic_modeling.cluster import (
        assign_to_clusters,
    )

    rng = np.random.default_rng(3)
    blob_a = rng.normal(0.0, 0.1, (30, 2))
    blob_b = rng.normal(10.0, 0.1, (30, 2))
    far = np.array([[100.0, 100.0]])
    pts = np.vstack([blob_a, blob_b, far]).astype(np.float32)
    fit_idx = np.arange(0, 60, 2)  # every other blob point; far point unfit
    fit_labels = np.where(fit_idx < 30, 0, 1).astype(np.int32)
    labels = assign_to_clusters(pts, fit_idx, fit_labels, 2)
    assert (labels[:30] == 0).all() and (labels[30:60] == 1).all()
    assert labels[60] == -1  # beyond every topic radius -> noise


def test_topic_modeling_small_corpus_guard(spark):
    """< 12 chunks -> single trivial topic at the origin (mod.rs:263-267)."""
    df = spark.createDataFrame(
        [(i, f"short doc {i}") for i in range(5)], ["doc_id", "text"]
    )
    out = topic_modeling(df, "text").collect()
    for r in out:
        assert r.topics.dominant_topic == 0
        assert r.topics.n_topics == 1 and r.topics.n_chunks == 5
        assert (r.topics.x, r.topics.y) == (0.0, 0.0)


def test_topic_modeling_all_empty(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], ["doc_id", "text"])
    out = topic_modeling(df, "text").collect()
    for r in out:
        assert r.topics.dominant_topic == -1
        assert r.topics.n_topics == 0 and r.topics.n_chunks == 0


def test_topic_modeling_long_doc_multi_chunk(spark):
    """A long doc yields multiple chunks and a multi-entry or
    single-entry distribution that still sums to 1."""
    long_text = " ".join(f"word{i % 50}" for i in range(600))
    df = spark.createDataFrame(
        [(0, long_text)] + [(i, f"pad doc {i} filler text") for i in range(1, 15)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.topics for r in topic_modeling(df, "text").collect()}
    assert out[0].n_chunks > 15  # long doc contributed multiple chunks
    dist = out[0].topic_distribution
    assert math.isclose(sum(p.proportion for p in dist), 1.0, rel_tol=1e-6)


def test_sampled_fit_driver_collect_is_bounded(spark, topic_corpus, monkeypatch):
    """Above max_fit_points the driver must collect ONLY the fit sample
    (<= ~1.3x max_fit_points pre-trim), never the full matrix — the
    distributed label-assignment contract. Spy on the single collect
    chokepoint and count rows."""
    from polars_text_spark.operators.topic_modeling import pipeline as pl

    collected_rows: list[int] = []
    real = pl._collect_vectors

    def spy(df):
        pdf = real(df)
        collected_rows.append(len(pdf))
        return pdf

    monkeypatch.setattr(pl, "_collect_vectors", spy)
    max_fit = 30  # corpus has 41 chunks -> sampled-fit path
    out = topic_modeling(
        topic_corpus,
        "text",
        min_cluster_size=8,
        seed=42,
        top_k=5,
        max_fit_points=max_fit,
    )
    n_rows = out.count()
    assert n_rows == 43
    # exactly one driver collect, bounded by the sampling slack
    assert len(collected_rows) == 1
    assert collected_rows[0] <= int(1.3 * 41) + 1  # Bernoulli at frac<=1


def test_sampled_fit_label_assignment_is_distributed(spark, topic_corpus):
    """The sampled-fit path's chunk labels come from a pandas-UDF plan,
    not a driver loop: the labeled plan must contain the assignment UDF
    (ArrowEvalPython / PythonUDF node) and the full result must agree
    with the geometry helpers' driver-side twin."""
    out = topic_modeling(
        topic_corpus,
        "text",
        min_cluster_size=8,
        seed=42,
        top_k=5,
        max_fit_points=30,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan


def test_release_tracked_unpersists_pipeline_frames(spark, topic_corpus):
    from polars_text_spark.persist import release_tracked, tracked_count

    def persistent_ids() -> set:
        sc = spark.sparkContext._jsc.sc()
        it = sc.getPersistentRDDs().keysIterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    release_tracked()  # clean slate from earlier tests in this session
    before = persistent_ids()
    out = topic_modeling(topic_corpus, "text", min_cluster_size=8, seed=42)
    out.write.format("noop").mode("overwrite").save()
    assert tracked_count() >= 2  # source + embedded registered
    released = release_tracked()
    assert released >= 2
    # every frame the pipeline persisted is gone (unrelated test caches
    # from this shared session are out of scope)
    assert persistent_ids() <= before
    assert tracked_count() == 0
