"""Margin-based bitext mining (beyond-reference: the LASER/CCMatrix
shape — align two monolingual corpora by embedding similarity to mine
parallel training pairs).

Given two embedded corpora (``left``/``right``, e.g. two languages in
a shared embedding space), a pair is mined when:

- each side is the OTHER side's best cross-corpus neighbor
  (mutual-best / "intersection" strategy), and
- the ratio margin ``cos(x, y) / ((avgK(x) + avgK(y)) / 2)`` clears a
  threshold, where ``avgK`` is the mean cosine of a side's top-k
  cross-corpus neighborhood — the Artetxe & Schwenk margin that
  suppresses hubs (vectors similar to everything score a low margin
  because their neighborhood average is high).

Scale shape: candidates come from ONE sha-banded LSH join between the
two corpora (`similarity.banded_scored_candidates` — never
all-pairs); both direction's top-k ranks ride the WindowGroupLimit
partial-rank pushdown; the k-NN means are map-side-combining
aggregates over the already-reduced top-k frame; the mutual-best join
keys on ids. Every stage is engine-replayable: sha signatures, exact
cosines, deterministic rank tie-breaks, and CANONICAL-ORDER k-NN
means (ascending-sorted fold — the char_entropy recipe) so the
nonassociative float sum is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.operators.similarity import (
    banded_scored_candidates,
    rank_topk,
    sha_band_keys,
)

__all__ = ["bitext_mine", "knn_avg_cosine"]


def knn_avg_cosine(topk: DataFrame) -> DataFrame:
    """Per-query mean cosine of a ``(query_id, neighbor_id, cosine,
    rank)`` top-k frame, summed in ASCENDING-cosine order via a sorted
    fold so the nonassociative double sum has one canonical result
    any engine reproduces (`SCALING.md` round-7 recipe). Returns
    ``(query_id, avg_cos)``."""
    return topk.groupBy("query_id").agg(
        (
            F.aggregate(
                F.array_sort(F.collect_list("cosine")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1))
        ).alias("avg_cos")
    )


def bitext_mine(
    left: DataFrame,
    right: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    margin_threshold: float = 1.0,
    num_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Mine aligned pairs: ``(left_id, right_id, cosine, margin)``,
    mutual-best cross-corpus neighbors with ratio margin at/above
    ``margin_threshold``. Ids must be disjoint across the two inputs
    only if the caller means to tell the sides apart downstream — the
    mining itself never compares within a side.

    Scale dial: candidates are a left x right band join, so per-bucket
    volume is |L_bucket| x |R_bucket| — grow ``num_planes`` with
    log2(corpus) per the sizing rule on
    :func:`~polars_text_spark.operators.similarity.lsh_band_keys`."""
    keys = lambda c: sha_band_keys(  # noqa: E731
        c, dim=dim, num_planes=num_planes, bands=bands
    )
    scored = banded_scored_candidates(
        right,
        left,
        keys,
        id_col=id_col,
        vec_col=vec_col,
        exclude_self=False,
    )
    # left -> right and right -> left views of the SAME candidate
    # frame (band collisions are symmetric); AQE stitches the two
    # consumers with ReusedExchange.
    lr = rank_topk(scored, k)
    rl = rank_topk(
        scored.select(
            F.col("neighbor_id").alias("query_id"),
            F.col("query_id").alias("neighbor_id"),
            "cosine",
        ),
        k,
    )
    avg_l = knn_avg_cosine(lr).select(
        F.col("query_id").alias("left_id"), F.col("avg_cos").alias("avg_l")
    )
    avg_r = knn_avg_cosine(rl).select(
        F.col("query_id").alias("right_id"), F.col("avg_cos").alias("avg_r")
    )
    best_lr = lr.filter(F.col("rank") == 1).select(
        F.col("query_id").alias("left_id"),
        F.col("neighbor_id").alias("right_id"),
        "cosine",
    )
    best_rl = rl.filter(F.col("rank") == 1).select(
        F.col("query_id").alias("right_id"),
        F.col("neighbor_id").alias("left_id"),
    )
    mutual = best_lr.join(best_rl, ["left_id", "right_id"])
    denom = (F.col("avg_l") + F.col("avg_r")) / F.lit(2.0)
    # try_divide: ANSI subexpression elimination can hoist a plain `/`
    # out of its when() guard; the guard defines the null semantics
    # (all-zero neighborhoods yield no margin), try_divide defuses the
    # evaluation.
    margin = F.when(denom > 0, F.try_divide(F.col("cosine"), denom))
    return (
        mutual.join(avg_l, "left_id")
        .join(avg_r, "right_id")
        .withColumn("margin", margin)
        .filter(F.col("margin") >= F.lit(margin_threshold))
        .select("left_id", "right_id", "cosine", "margin")
    )
