"""Bucketed ANN store: similarity search without re-shuffling the corpus.

The vector-search twin of :mod:`polars_text_spark.operators.dedup_store`.
At 100 TB the corpus side of every ANN query is write-once state: LSH
band keys and unit-normalized vectors only change when the corpus does.
Persisting them ONCE as bucketed tables means

- **repeated queries** (every new query batch, threshold tuning) join
  the tiny query side against the standing band table — the store side
  reads co-located buckets with NO Exchange (plan-asserted);
- the exact-cosine re-rank joins candidates against the unit-vector
  table bucketed by id — again shuffle-free on the corpus side;
- the band keys are the sha-derived deterministic planes
  (:func:`polars_text_spark.operators.similarity.sha_band_keys`), so
  store contents are reproducible and auditable across engines.

Store layout (two catalog tables):
``<name>_bands(id, band_key string)`` bucketed+sorted by ``band_key``;
``<name>_vectors(id, u array<double>)`` bucketed+sorted by ``id``.
Signature parameters are embedded at write time; pass the same ones at
query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_text_spark.operators.similarity import (
    dot,
    rank_topk,
    sha_band_keys,
    with_l2_normalized,
)
from polars_text_spark.sources.bucketing import (
    clear_table,
    read_bucketed,
    write_bucketed,
)

__all__ = ["write_ann_store", "topk_from_store"]


def write_ann_store(
    vectors: DataFrame,
    name: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    num_planes: int = 16,
    bands: int = 4,
    buckets: int = 8,
) -> None:
    """Materialize ``<name>_bands`` and ``<name>_vectors`` bucketed
    tables for ``vectors`` (one pass over the vectors each)."""
    base = vectors.where(F.col(vec_col).isNotNull())
    banded = base.select(
        F.col(id_col).alias("id"),
        F.explode(
            sha_band_keys(
                F.col(vec_col), dim=dim, num_planes=num_planes, bands=bands
            )
        ).alias("band_key"),
    )
    write_bucketed(
        banded,
        f"{name}_bands",
        bucket_by="band_key",
        buckets=buckets,
        sort_by="band_key",
    )
    unit = with_l2_normalized(
        base.select(F.col(id_col).alias("id"), vec_col), vec_col, "u"
    ).select("id", "u")
    write_bucketed(
        unit, f"{name}_vectors", bucket_by="id", buckets=buckets, sort_by="id"
    )
    # signature parameters ride with the store so a query-time mismatch
    # (whose band keys could NEVER collide -> silent recall-0) fails loudly
    meta = vectors.sparkSession.createDataFrame(
        [(int(dim), int(num_planes), int(bands))],
        "dim int, num_planes int, bands int",
    )
    clear_table(vectors.sparkSession, f"{name}_meta")
    meta.write.format("parquet").mode("overwrite").saveAsTable(f"{name}_meta")


def topk_from_store(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    num_planes: int = 16,
    bands: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-``k`` neighbors of ``queries`` against the standing store:
    band-key equi-join candidates (store side shuffle-free), exact
    cosine re-rank against the bucketed unit-vector table. Returns
    ``(query_id, neighbor_id, cosine, rank)`` — value-identical to
    :func:`polars_text_spark.operators.similarity.cosine_topk_lsh_sha`
    over the same corpus (tested). Raises if (dim, num_planes, bands)
    differ from the store's write-time parameters."""
    m = spark.table(f"{name}_meta").collect()[0]
    if (m["dim"], m["num_planes"], m["bands"]) != (dim, num_planes, bands):
        raise ValueError(
            f"ann store '{name}' was written with dim={m['dim']}, "
            f"num_planes={m['num_planes']}, bands={m['bands']}; query-time "
            f"parameters (dim={dim}, num_planes={num_planes}, "
            f"bands={bands}) would produce band keys that can never "
            "collide with the store"
        )
    q = with_l2_normalized(
        queries.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("query_id"), vec_col
        ),
        vec_col,
        "__qvec",
    ).select(
        "query_id",
        "__qvec",
        F.explode(
            sha_band_keys(
                F.col(vec_col), dim=dim, num_planes=num_planes, bands=bands
            )
        ).alias("band_key"),
    )
    store_bands = read_bucketed(spark, f"{name}_bands").select(
        F.col("id").alias("neighbor_id"), "band_key"
    )
    cands = (
        store_bands.join(q, "band_key")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", "__qvec")
    )
    if exclude_self:
        cands = cands.filter(F.col("neighbor_id") != F.col("query_id"))
    unit = read_bucketed(spark, f"{name}_vectors").select(
        F.col("id").alias("neighbor_id"), F.col("u").alias("__vvec")
    )
    scored = cands.join(unit, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        dot(F.col("__qvec"), F.col("__vvec")).alias("cosine"),
    )
    return rank_topk(scored, k)
