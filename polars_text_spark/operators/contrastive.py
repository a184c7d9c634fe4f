"""Contrastive-triplet mining over an embedding column
(beyond-reference: training-data generation for embedding models).

Retrieval/embedding training wants ``(anchor, positive,
hard_negative)`` triplets: a pair the model should pull together and a
near-miss it should push apart. Mining hard negatives is the expensive
part at corpus scale — the informative negatives are exactly the ones
an ANN search surfaces. This module derives BOTH sides from ONE
banded-LSH candidate shuffle (`similarity.banded_scored_candidates`):

- positives: candidate pairs with cosine >= ``pos_threshold``;
- hard negative per anchor: the highest-cosine candidate strictly
  below ``neg_ceiling`` (a margin band ``[neg_ceiling,
  pos_threshold)`` is excluded as too-ambiguous-to-label, the
  standard margin trick), deterministic tie-break on smaller id.

Scale shape: the self-join shuffles on band keys (never all-pairs),
the negative selection is a map-side-combining ``max(struct)`` groupBy
on anchor over the already-reduced candidate frame, and the final
positive-x-negative join keys on anchor. Text never moves — only ids
and cosines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.operators.similarity import (
    banded_scored_candidates,
    sha_band_keys,
)

__all__ = ["contrastive_triplets", "hard_negatives"]


def hard_negatives(
    scored: DataFrame,
    *,
    neg_ceiling: float,
) -> DataFrame:
    """One hard negative per anchor from a ``(query_id, neighbor_id,
    cosine)`` candidate frame: the max-cosine candidate strictly below
    ``neg_ceiling``, ties to the smaller neighbor_id.

    ``min(struct(-cosine, neighbor_id))`` instead of a per-anchor
    window: struct ordering is lexicographic, so the aggregate IS the
    deterministic argmax (min of the negated cosine = max cosine, ties
    fall through to the smaller neighbor_id), and a plain ``min`` does
    partial (map-side) aggregation — k rows per mapper cross the
    anchor shuffle, where a window would move every candidate. The
    sign flip lives on the always-numeric cosine, NOT the id: ids are
    a generic parameter (strings for doc/URL ids are common), and
    negating a string id would throw CAST_INVALID_INPUT under ANSI.
    Null neighbor_ids are dropped up front — struct MIN would
    otherwise prefer a null id over a real one on a cosine tie (nulls
    sort first ascending), and a triplet with no negative id is
    useless to any consumer."""
    best = (
        scored.filter(
            (F.col("cosine") < F.lit(neg_ceiling))
            & F.col("neighbor_id").isNotNull()
        )
        .groupBy("query_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cosine")).alias("negc"),
                    F.col("neighbor_id").alias("neighbor_id"),
                )
            ).alias("b")
        )
    )
    return best.select(
        "query_id",
        F.col("b.neighbor_id").alias("negative_id"),
        (-F.col("b.negc")).alias("neg_cosine"),
    )


def contrastive_triplets(
    vectors: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pos_threshold: float = 0.9,
    neg_ceiling: float = 0.8,
    num_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Mine ``(anchor_id, positive_id, pos_cosine, negative_id,
    neg_cosine)`` triplets from one corpus-wide banded-LSH pass.

    Both triplet legs come from the same sha-derived band-key
    self-join (`similarity.sha_band_keys` — engine-replayable
    signatures, so an external SQL engine can re-derive every
    candidate, every cosine, and every selection): positives are
    candidates at/above ``pos_threshold``; each anchor's hard negative
    is its best candidate below ``neg_ceiling``. Anchors without a
    qualifying negative are dropped (inner join) — a triplet without a
    hard negative is just a dup pair, which the dedup operators
    already emit. Every positive pair appears in BOTH orientations
    (each side serves as anchor), matching how contrastive losses
    consume pairs.

    ``pos_threshold`` must exceed ``neg_ceiling``; the gap is the
    ambiguity margin excluded from training.

    Scale dial: this is a corpus x corpus band self-join, so candidate
    volume per bucket is quadratic in bucket occupancy (~n / 2^(
    num_planes/bands) vectors per bucket) — grow ``num_planes`` with
    log2(n) (the sizing rule on
    :func:`~polars_text_spark.operators.similarity.lsh_band_keys`) so
    buckets stay bounded; the default 4-bit bands are sized for
    ~10^5-10^6 vectors, not a web corpus."""
    if not pos_threshold > neg_ceiling:
        raise ValueError(
            f"pos_threshold ({pos_threshold}) must exceed neg_ceiling "
            f"({neg_ceiling}); the gap is the ambiguity margin"
        )
    scored = banded_scored_candidates(
        vectors,
        vectors,
        lambda c: sha_band_keys(
            c, dim=dim, num_planes=num_planes, bands=bands
        ),
        id_col=id_col,
        vec_col=vec_col,
        exclude_self=True,
    )
    pos = scored.filter(F.col("cosine") >= F.lit(pos_threshold)).select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("positive_id"),
        F.col("cosine").alias("pos_cosine"),
    )
    neg = hard_negatives(scored, neg_ceiling=neg_ceiling).select(
        F.col("query_id").alias("anchor_id"),
        "negative_id",
        "neg_cosine",
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "positive_id",
        "pos_cosine",
        "negative_id",
        "neg_cosine",
    )
