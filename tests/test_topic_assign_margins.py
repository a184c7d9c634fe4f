"""ADVICE r13 #4 companion for the ``topic_assign_oos`` oracle: the
query hashes integer labels produced by float32 UDF geometry against a
double-precision DuckDB replay with no tolerance at the argmin tie or
the radius*1.5 gate. This test recomputes the full reduced-space
geometry in float64 and asserts every assignment clears BOTH decision
boundaries by a real margin — so a last-ulp float32-vs-double drift
can never flip a label, at this dataset or a rescaled one."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

# relative margins a float32 pipeline can never erode: the UDF computes
# in float32 (~1e-7 relative error per op, dim 64 + k 5 accumulations
# => worst case well under 1e-4 relative on a distance)
ARGMIN_REL_MARGIN = 1e-4
GATE_REL_MARGIN = 1e-4


def _geometry(spark, sf_dir):
    from polars_text_spark.operators.similarity import _sha_sign
    from polars_text_spark.operators.topic_modeling.cluster import (
        cluster_geometry,
    )

    vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
        .toPandas()
    )
    ids = vecs["vec_id"].to_numpy()
    mat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in vecs["embedding"]]
    )
    fit_mask = (ids % 4 == 0) & (ids < 4000)
    # the query's hash labels: sha60(vec_id) % 6 - 1
    import hashlib

    def sha_lbl(i):
        h = hashlib.sha256(str(i).encode()).hexdigest()[:15]
        return int(h, 16) % 6 - 1

    labels = np.array([sha_lbl(i) for i in ids])
    comps = np.array(
        [[_sha_sign(j, p) for p in range(64)] for j in range(5)],
        dtype=np.float64,
    )
    mean = mat[fit_mask].mean(axis=0, keepdims=True)
    red = (mat - mean) @ comps.T  # float64 reduced coordinates
    fit_red = red[fit_mask]
    fit_lbl = labels[fit_mask]
    keep = fit_lbl >= 0
    centroids, radii = cluster_geometry(fit_red[keep], fit_lbl[keep], n_topics=5)
    return ids, red, np.asarray(centroids, dtype=np.float64), np.asarray(
        radii, dtype=np.float64
    )


@pytest.mark.parametrize(
    "sf_dir_case", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_assignments_clear_both_boundaries(spark, sf_dir_case):
    ids, red, centroids, radii = _geometry(spark, sf_dir_case)
    d = np.sqrt(
        ((red[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    )  # (n, k) distances in float64
    order = np.argsort(d, axis=1)
    win = d[np.arange(len(ids)), order[:, 0]]
    runner = d[np.arange(len(ids)), order[:, 1]]

    # (a) argmin margin: the runner-up must exceed the winner by a
    # relative gap float32 cannot close (exact ties would sort by
    # label on both engines identically, but NEAR-ties are the hash
    # hazard the ADVICE names)
    rel_gap = (runner - win) / np.maximum(win, 1e-12)
    near_ties = int((rel_gap < ARGMIN_REL_MARGIN).sum())
    assert near_ties == 0, (
        f"{near_ties} vectors sit within {ARGMIN_REL_MARGIN} relative "
        "of an argmin tie — the topic_assign_oos oracle is at risk on "
        f"{sf_dir_case}"
    )

    # (b) radius-gate margin: the winning distance must not graze the
    # 1.5 * radius outlier threshold
    gate = radii[order[:, 0]] * 1.5
    rel_gate_gap = np.abs(win - gate) / np.maximum(gate, 1e-12)
    grazing = int((rel_gate_gap < GATE_REL_MARGIN).sum())
    assert grazing == 0, (
        f"{grazing} vectors sit within {GATE_REL_MARGIN} relative of "
        f"the 1.5-radius gate on {sf_dir_case}"
    )


def test_float32_udf_agrees_with_float64_replay(spark):
    """End-to-end: the pipeline's own float32 _assign_udf must produce
    exactly the float64 replay's labels at sf0.001 — the margin
    assertions above are what MAKE this equality robust."""
    from polars_text_spark.operators.similarity import _sha_sign
    from polars_text_spark.operators.topic_modeling.pipeline import (
        _assign_udf,
    )
    from polars_text_spark.operators.topic_modeling.reduce import (
        LinearProjector,
    )

    sf_dir = "/root/testdata/sf0.001"
    ids, red, centroids, radii = _geometry(spark, sf_dir)
    d = np.sqrt(
        ((red[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    )
    best = d.argmin(axis=1)
    win = d[np.arange(len(ids)), best]
    expect = np.where(win <= radii[best] * 1.5, best, -1)

    vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    mat_pd = vecs.toPandas()
    mat = np.stack(
        [np.asarray(v, dtype=np.float32) for v in mat_pd["embedding"]]
    )
    fit_mask = (mat_pd["vec_id"].to_numpy() % 4 == 0) & (
        mat_pd["vec_id"].to_numpy() < 4000
    )
    mean = np.asarray(mat[fit_mask], dtype=np.float64).mean(
        axis=0, keepdims=True
    )
    comps_k = np.array([[_sha_sign(j, p) for p in range(64)] for j in range(5)])
    comps_2 = np.array(
        [[_sha_sign(j, p) for p in range(64)] for j in (100, 101)]
    )
    got = (
        vecs.withColumn(
            "__as",
            _assign_udf(
                LinearProjector(mean, comps_k),
                LinearProjector(mean, comps_2),
                centroids.astype(np.float32),
                radii.astype(np.float32),
            )(F.col("embedding")),
        )
        .select("vec_id", F.col("__as.label").alias("label"))
        .toPandas()
    )
    got_map = dict(zip(got["vec_id"], got["label"]))
    mismatches = [
        (int(i), int(got_map[i]), int(e))
        for i, e in zip(ids, expect)
        if int(got_map[i]) != int(e)
    ]
    assert not mismatches, mismatches[:5]
