"""Continuous ANN serving (streaming/ingest.py::
stream_topk_against_store): each micro-batch of query vectors scores
against the standing bucketed store — stream==batch parity is
structural (topk_from_store runs verbatim per bounded batch), results
land exactly-once via dynamic partition overwrite, and store
DELETIONS take effect at the next trigger without restarting the
stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.ann_store import (
    delete_ids,
    topk_from_store,
    write_ann_store,
)
from polars_text_spark.streaming.ingest import (
    stream_topk_against_store,
    topk_serve_batch,
)


def _vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )


def test_stream_serving_matches_batch(spark, sf_dir, tmp_path):
    vecs = _vectors(spark, sf_dir)
    write_ann_store(vecs, "ann_serve_s", dim=64, buckets=4)
    queries = vecs.filter(F.col("vec_id") < 6)
    want = {
        (r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9))
        for r in topk_from_store(
            spark, "ann_serve_s", queries, k=5, dim=64
        ).collect()
    }

    # drop the query stream as two parquet files -> two triggers
    qdir = tmp_path / "queries"
    queries.filter(F.col("vec_id") < 3).coalesce(1).write.parquet(
        str(qdir), mode="append"
    )
    queries.filter(F.col("vec_id") >= 3).coalesce(1).write.parquet(
        str(qdir), mode="append"
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir))
    )
    out = str(tmp_path / "hits")
    q = stream_topk_against_store(
        stream,
        "ann_serve_s",
        out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=5,
        dim=64,
        available_now=True,
    )
    assert q.awaitTermination(600), "serving stream did not finish"
    rows = spark.read.parquet(out)
    got = {
        (r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9))
        for r in rows.collect()
    }
    assert got == want
    assert {r["__serve_batch"] for r in rows.collect()} == {0, 1}


def test_serve_batch_redelivery_idempotent_and_sees_deletes(
    spark, sf_dir, tmp_path
):
    vecs = _vectors(spark, sf_dir)
    write_ann_store(vecs, "ann_serve_d", dim=64, buckets=4)
    queries = vecs.filter(F.col("vec_id") == 1)
    out = str(tmp_path / "hits")
    serve = topk_serve_batch("ann_serve_d", out, k=3, dim=64)

    serve(queries, 0)
    serve(queries, 0)  # redelivery rewrites partition 0, no dup rows
    first = spark.read.parquet(out).collect()
    assert len(first) == 3
    top1 = [r for r in first if r.rank == 1][0].neighbor_id

    # delete the current top hit; the NEXT trigger must not return it
    delete_ids(
        spark.createDataFrame([(top1,)], "vec_id long"), "ann_serve_d"
    )
    serve(queries, 1)
    rows = spark.read.parquet(out)
    assert rows.count() == 6
    second = {r.neighbor_id for r in rows.collect() if r["__serve_batch"] == 1}
    assert top1 not in second and len(second) == 3
