"""Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means over
an embedding column, then near-duplicate pairs WITHIN each cluster by
cosine similarity — the modern "same content, different words" dedup
step that MinHash cannot see.

Distributed shape (the part that must survive 100 TB):

- **Assignment is map-only.** Centroids are a k x dim double matrix —
  kilobytes — broadcast into the plan as literals; every row computes
  its argmin-distance cluster in one Catalyst projection (whole-stage
  codegen, no shuffle, no Python). For large k (10k+ clusters at
  100 TB) switch the assignment to the numpy Pandas-UDF path already
  used by IVF (:func:`polars_text_spark.operators.similarity.
  cosine_topk_ivf`) — same contract, Arrow-batched.
- **The mean update is one groupBy on (cluster, dim)** — k x dim
  groups, map-side partial aggregation, followed by a driver collect
  of exactly k x dim rounded doubles (same bounded-collect precedent
  as the IVF codebook). Per-iteration cost is one scan + one tiny
  shuffle; ``iterations`` is small and fixed.
- **Pair generation is blocked by cluster** — the whole point of
  SemDeDup: candidate pairs exist only inside a cluster, so the join
  is an equi-join on the cluster id and per-cluster work is bounded
  by the largest cluster. Scale k with the corpus so clusters stay
  ~constant-sized; never an unblocked cross join.

Determinism (what makes this ORACLE-CHECKABLE, rare for k-means):

- init = the k vectors with the smallest ids (no RNG);
- float32 inputs are cast to float64 once; every distance/dot is a
  sequential left fold, bit-identical to DuckDB's ``list_reduce``;
- argmin ties resolve to the smallest cluster id (first position of
  the min) in both engines;
- centroid means are rounded to ``decimals`` BETWEEN iterations in
  both engines, so iteration t+1 consumes bit-identical centroids
  even though distributed summation order differs in the last ulp;
- empty clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.operators._cols import require_free_columns

__all__ = ["kmeans_assign", "semantic_dup_pairs"]


def _sq_dist(vec, centroid: list[float]):
    """Squared L2 distance between an array<double> column and a
    centroid literal, as a sequential left fold (0 + d1 + d2 + ...)."""
    lit = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_expr(vec, centroids: list[list[float]]):
    """0-based cluster id = first position of the minimum distance."""
    dists = F.array(*[_sq_dist(vec, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 8,
    iterations: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """Deterministic Lloyd k-means; returns ``(id_col, cluster)``.

    ``iterations`` assignment rounds are run; the mean update between
    rounds rounds every centroid component to ``decimals`` (see module
    docstring — this is what keeps two engines in lockstep). If the
    frame has fewer than ``k`` rows, k degrades to the row count.
    """
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    require_free_columns(df, ("__km_id", "__km_v", "__km_c"), "kmeans_assign")

    e = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__km_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "__km_v"
        ),
    )
    # deterministic init: the k smallest-id vectors, exact values
    seed_rows = e.orderBy("__km_id").limit(k).collect()
    centroids = [list(r["__km_v"]) for r in seed_rows]
    if not centroids:
        raise ValueError("kmeans_assign: no non-null vectors")
    dim = len(centroids[0])

    for it in range(iterations):
        assigned = e.withColumn("__km_c", _assign_expr(F.col("__km_v"), centroids))
        if it == iterations - 1:
            return assigned.select(
                F.col("__km_id").alias(id_col),
                F.col("__km_c").alias("cluster"),
            )
        # mean update: k x dim groups, rounded IN Spark so the literal
        # fed to the next assignment uses Spark's rounding (matching
        # the oracle's round() at the same precision)
        mean_rows = (
            assigned.select("__km_c", F.posexplode("__km_v"))
            .groupBy("__km_c", "pos")
            .agg(F.round(F.avg("col"), decimals).alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cluster.setdefault(r["__km_c"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_cluster[ci][p] for p in range(dim)]
            if ci in by_cluster
            else centroids[ci]  # empty cluster keeps its centroid
            for ci in range(len(centroids))
        ]
    raise AssertionError("unreachable")


def semantic_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 8,
    iterations: int = 2,
    tau: float = 0.92,
    decimals: int = 6,
) -> DataFrame:
    """SemDeDup pairs: ``(id_a, id_b, cluster, cosine)`` for pairs in
    the SAME k-means cluster with cosine similarity >= ``tau``
    (``id_a < id_b``; cosine rounded to ``decimals`` in the output,
    thresholded on the unrounded fold value)."""
    from polars_text_spark.operators.similarity import dot, with_l2_normalized

    require_free_columns(
        df, ("__sd_id", "__sd_u", "__sd_c", "__sd_cos"), "semantic_dup_pairs"
    )

    assign = kmeans_assign(
        df, vec_col, id_col, k=k, iterations=iterations, decimals=decimals
    )
    # normalize per ROW (n norms, not n^2) via the projection-staged
    # helper, so the per-pair work is a single dot product
    unit = with_l2_normalized(
        df.filter(F.col(vec_col).isNotNull()), vec_col, "__sd_u"
    ).select(F.col(id_col).alias("__sd_id"), "__sd_u")
    sided = unit.join(
        assign.select(
            F.col(id_col).alias("__sd_id"), F.col("cluster").alias("__sd_c")
        ),
        "__sd_id",
    )
    a = sided.select(
        F.col("__sd_c").alias("cluster"),
        F.col("__sd_id").alias("id_a"),
        F.col("__sd_u").alias("__sd_ua"),
    )
    b = sided.select(
        F.col("__sd_c").alias("cluster"),
        F.col("__sd_id").alias("id_b"),
        F.col("__sd_u").alias("__sd_ub"),
    )
    pairs = a.join(b, "cluster").filter(F.col("id_a") < F.col("id_b"))
    cos = dot(F.col("__sd_ua"), F.col("__sd_ub"))
    return (
        pairs.withColumn("__sd_cos", cos)
        .filter(F.col("__sd_cos") >= tau)
        .select(
            "id_a",
            "id_b",
            "cluster",
            F.round("__sd_cos", decimals).alias("cosine"),
        )
    )
