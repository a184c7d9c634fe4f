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

__all__ = ["kmeans_assign", "kmeans_fit", "semantic_dup_pairs"]

# Above this many inlined centroid literals (k * dim), the argmin
# expression would blow Catalyst plan / codegen size (real SemDeDup
# runs k~10^4, dim~384 = 3.8M literals); switch to the broadcast-join
# assignment automatically.
JOIN_ASSIGN_THRESHOLD = 4096


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


def _assign_literal(e: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Map-only assignment: centroids inlined as literals, argmin in
    one whole-stage-codegen projection. Right for small k*dim."""
    return e.withColumn("__km_c", _assign_expr(F.col("__km_v"), centroids))


def _assign_join(e: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Broadcast-join assignment for large k*dim: the k x dim centroid
    matrix rides as a broadcast TABLE instead of plan literals (plan
    size stays O(1) in k). Each row matches all k centroid rows via a
    BroadcastNestedLoopJoin whose build side is the k-row centroid
    frame (there is no selective equi-key — every row meets every
    centroid, so NLJ-over-broadcast IS the hash-join-equivalent
    physical form here), computes ONE left-fold distance per pair,
    then a min(struct(dist, cid)) aggregate picks the argmin with ties
    to the smallest cluster id — value-identical to
    :func:`_assign_literal` (same fold, same tie-break).

    Cost note: the per-id aggregate collapses the k expanded rows
    map-side (they are generated adjacently from one input row), so the
    exchange moves ~n rows, not n*k. That one small shuffle is the
    price of not blowing codegen at k~10^4; for shuffle-free large-k
    assignment use the numpy Pandas-UDF path in
    :func:`polars_text_spark.operators.similarity.cosine_topk_ivf`.
    """
    spark = e.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        schema="__km_cid int, __km_cent array<double>",
    )
    expanded = e.crossJoin(F.broadcast(cdf))
    d = F.aggregate(
        F.zip_with(
            F.col("__km_v"), F.col("__km_cent"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        expanded.select(
            "__km_id",
            "__km_v",
            F.struct(d.alias("d"), F.col("__km_cid").alias("cid")).alias(
                "__km_dc"
            ),
        )
        .groupBy("__km_id")
        .agg(
            F.min("__km_dc").getField("cid").alias("__km_c"),
            F.first("__km_v").alias("__km_v"),
        )
        .select("__km_id", "__km_v", "__km_c")
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 8,
    iterations: int = 2,
    decimals: int = 6,
    assign_strategy: str = "auto",
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic Lloyd k-means; returns ``(assignments, centroids)``
    where ``assignments`` is ``(id_col, cluster)`` and ``centroids`` is
    the k x dim matrix used for the FINAL assignment round (the list a
    caller needs to route new points — e.g. IVF query probes — through
    the same partitioning).

    ``iterations`` assignment rounds are run; the mean update between
    rounds rounds every centroid component to ``decimals`` (see module
    docstring — this is what keeps two engines in lockstep). If the
    frame has fewer than ``k`` rows, k degrades to the row count.
    Rows whose vector length differs from the seed dimensionality are
    dropped (ragged inputs would otherwise surface as null distances /
    missing centroid positions deep inside the job).

    ``assign_strategy``: ``"literal"`` inlines centroids in the plan
    (map-only, no shuffle), ``"join"`` broadcasts them as a table (one
    small shuffle, plan size O(1) in k), ``"auto"`` picks ``join`` when
    ``k * dim > JOIN_ASSIGN_THRESHOLD``.
    """
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    if assign_strategy not in ("auto", "literal", "join"):
        raise ValueError(f"unknown assign_strategy {assign_strategy!r}")
    require_free_columns(
        df,
        ("__km_id", "__km_v", "__km_c", "__km_cid", "__km_cent", "__km_one",
         "__km_dc"),
        "kmeans_fit",
    )

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
        raise ValueError("kmeans_fit: no non-null vectors")
    dim = len(centroids[0])
    if any(len(c) != dim for c in centroids):
        raise ValueError(
            f"kmeans_fit: seed vectors are ragged (expected dim {dim})"
        )
    # Ragged rows can't be assigned (zip_with pads with null -> null
    # distances) — drop them up front instead of failing mid-update.
    e = e.filter(F.size("__km_v") == dim)

    if assign_strategy == "auto":
        assign_strategy = (
            "join" if k * dim > JOIN_ASSIGN_THRESHOLD else "literal"
        )
    assign = _assign_join if assign_strategy == "join" else _assign_literal

    for it in range(iterations):
        assigned = assign(e, centroids)
        if it == iterations - 1:
            return (
                assigned.select(
                    F.col("__km_id").alias(id_col),
                    F.col("__km_c").alias("cluster"),
                ),
                centroids,
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
            # .get(p) with the previous component as fallback: a
            # position can only be missing if every member vector had a
            # null there — degrade to the prior centroid value instead
            # of an opaque KeyError
            [by_cluster[ci].get(p, centroids[ci][p]) for p in range(dim)]
            if ci in by_cluster
            else centroids[ci]  # empty cluster keeps its centroid
            for ci in range(len(centroids))
        ]
    raise AssertionError("unreachable")


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 8,
    iterations: int = 2,
    decimals: int = 6,
    assign_strategy: str = "auto",
) -> DataFrame:
    """Deterministic Lloyd k-means; returns ``(id_col, cluster)``.
    Thin wrapper over :func:`kmeans_fit` for callers that don't need
    the centroid matrix."""
    assigned, _ = kmeans_fit(
        df,
        vec_col,
        id_col,
        k=k,
        iterations=iterations,
        decimals=decimals,
        assign_strategy=assign_strategy,
    )
    return assigned


def _enforce_cluster_cap(
    df: DataFrame,
    assign: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    max_cluster_size: int,
    on_oversize: str,
    iterations: int,
    decimals: int,
    _depth: int = 0,
) -> DataFrame:
    """Check cluster populations against ``max_cluster_size``; raise or
    recursively sub-split oversized clusters (see
    :func:`semantic_dup_pairs`). The size check collects at most one
    row per cluster — the same bounded-collect budget as the centroid
    update. Raises if a cluster cannot be split below the cap after 8
    levels (e.g. > cap identical vectors: k-means cannot separate
    coincident points)."""
    from polars_text_spark.persist import track_persist

    if max_cluster_size < 2:
        raise ValueError("max_cluster_size must be >= 2")
    # assign is consumed once for the size check and once per oversized
    # cluster below (plus by the caller): persist so the full k-means
    # lineage doesn't recompute per consumer
    assign = track_persist(assign.persist())
    sizes = (
        assign.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    over = [(r["cluster"], r["n"]) for r in sizes if r["n"] > max_cluster_size]
    if not over:
        return assign
    if on_oversize == "raise":
        detail = ", ".join(f"cluster {c}: {n} rows" for c, n in sorted(over))
        raise ValueError(
            f"semantic_dup_pairs: {len(over)} cluster(s) exceed "
            f"max_cluster_size={max_cluster_size} ({detail}). Within-"
            f"cluster pairing is O(size^2) — raise k (k must scale "
            f"with n) or pass on_oversize='split'."
        )
    if _depth >= 8:
        raise ValueError(
            "semantic_dup_pairs: could not split clusters below "
            f"max_cluster_size={max_cluster_size} after 8 levels "
            "(coincident-vector mass?)"
        )
    over_ids = [c for c, _ in over]
    next_base = max(r["cluster"] for r in sizes) + 1
    pieces = [assign.filter(~F.col("cluster").isin(over_ids))]
    for c, n in sorted(over):
        members = assign.filter(F.col("cluster") == c).select(id_col)
        sub = df.join(members, id_col)
        k2 = min(n, max(2, -(-n // max_cluster_size)))
        sub_assign = kmeans_assign(
            sub, vec_col, id_col, k=k2, iterations=iterations,
            decimals=decimals,
        )
        pieces.append(
            sub_assign.select(
                id_col,
                (F.col("cluster") + F.lit(next_base)).cast("int").alias(
                    "cluster"
                ),
            )
        )
        next_base += k2
    refined = pieces[0]
    for p in pieces[1:]:
        refined = refined.unionByName(p)
    return _enforce_cluster_cap(
        df, refined, vec_col, id_col,
        max_cluster_size=max_cluster_size, on_oversize=on_oversize,
        iterations=iterations, decimals=decimals, _depth=_depth + 1,
    )


def semantic_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 8,
    iterations: int = 2,
    tau: float = 0.92,
    decimals: int = 6,
    max_cluster_size: int | None = None,
    on_oversize: str = "raise",
) -> DataFrame:
    """SemDeDup pairs: ``(id_a, id_b, cluster, cosine)`` for pairs in
    the SAME k-means cluster with cosine similarity >= ``tau``
    (``id_a < id_b``; cosine rounded to ``decimals`` in the output,
    thresholded on the unrounded fold value).

    **Scale dial — k must grow with n.** Pair generation is all-pairs
    WITHIN a cluster (the published SemDeDup shape), so per-cluster
    work is O(size^2): with a fixed k, clusters are O(n/k) and total
    pair count O(n^2/k) — a cliff at 100x the corpus. Real SemDeDup
    runs tens of thousands of clusters so cluster populations stay
    roughly constant. ``max_cluster_size`` makes the dial enforceable:

    - ``on_oversize="raise"`` (default): fail fast with the oversized
      cluster ids and sizes — the caller should raise ``k``.
    - ``on_oversize="split"``: recursively sub-split each oversized
      cluster with a further deterministic k-means (new integer
      cluster ids above the existing range) until every cluster fits;
      pairs are then generated within the REFINED clusters, trading a
      little recall (pairs straddling a split) for bounded work.

    The cluster-size check is one tiny aggregate (<= k rows collected).
    """
    from polars_text_spark.operators.similarity import dot, with_l2_normalized

    require_free_columns(
        df, ("__sd_id", "__sd_u", "__sd_c", "__sd_cos"), "semantic_dup_pairs"
    )
    if on_oversize not in ("raise", "split"):
        raise ValueError(f"unknown on_oversize {on_oversize!r}")

    assign = kmeans_assign(
        df, vec_col, id_col, k=k, iterations=iterations, decimals=decimals
    )
    if max_cluster_size is not None:
        assign = _enforce_cluster_cap(
            df,
            assign,
            vec_col,
            id_col,
            max_cluster_size=max_cluster_size,
            on_oversize=on_oversize,
            iterations=iterations,
            decimals=decimals,
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
