"""Distributed TRAINING for the hashing-trick quality classifier —
the missing half of ``hashed_classifier_score`` (which scores with a
given weight vector; CCNet/LLaMA-class pipelines learn that vector
from labeled seed sets like wiki-vs-raw-crawl).

Algorithm: full-batch averaged-update PERCEPTRON over hashed
token-count features, in INTEGER arithmetic end to end — the
``operators/graph.py`` PageRank trick applied to learning. Floating
gradients would make the trained weights depend on per-partition
summation order (and drift from any differential oracle after one
round); integer sums are exactly associative/commutative, so the
weights are bit-identical across partitionings, reruns, AND engines:
a SQL oracle replays every training round.

Per round r (weights start at zero):

- margin_d = Σ_b xq_db · w_b          (int64)
- misclassified: y_d · margin_d <= 0  (round 1: everybody)
- w_b += floor(Σ_{d miscls} y_d · xq_db / N)

with ``xq_db = floor(cnt_db · scale / n_d)`` the length-normalized
integer feature value (Σ_b xq_db <= scale per doc) and N the labeled
doc count. The floor division is computed as
``(s - pmod(s, N)) div N`` — an exactly-divisible numerator, so
truncating and flooring agree and both engines produce the same
quotient for negative sums.

Magnitude audit (why int64 never overflows): |xq| <= scale (1e6);
per-bucket update sums |s| <= N·scale; per-round weight growth
<= scale, so |w| <= rounds·scale (~1e7 at any sane round count);
|margin| <= scale · max|w| <= rounds·scale² ~ 1e13 « 2^63.

Scale shape: features build once (explode + one (doc, bucket)
groupBy) and persist across rounds; each round is one broadcast join
with the 4096-row weight table + two map-side-combining groupBys
(per-doc margin, per-bucket update). Weight tables are
``localCheckpoint``-ed per round to truncate lineage
(components.py's iteration pattern) — nothing weight-sized ever
lands on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.operators._cols import require_free_columns

__all__ = [
    "classifier_features",
    "trained_float_weights",
    "integer_classifier_margins",
    "train_hashed_perceptron",
]

SCALE = 1_000_000


def classifier_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 4096,
    scale: int = SCALE,
) -> DataFrame:
    """Integer hashed features ``(id_col, bucket, xq)`` with
    ``xq = floor(cnt · scale / n_tokens)``. The bucket hash is the
    SAME sha-derived map ``hashed_classifier_score`` uses
    (sha_token_hash('b:' || token) % n_buckets), so weights trained
    here score correctly there. Docs with no tokens are absent."""
    from polars_text_spark.functions.analysis import ws_token_array
    from polars_text_spark.operators.dedup import sha_token_hash

    toks = df.select(
        F.col(id_col), ws_token_array(F.col(text_col)).alias("__tk")
    ).filter(F.size("__tk") > 0)
    exploded = toks.select(
        id_col,
        F.size("__tk").alias("__n"),
        F.explode("__tk").alias("__t"),
    )
    bucket = sha_token_hash(F.concat(F.lit("b:"), F.col("__t"))) % n_buckets
    return (
        exploded.select(id_col, "__n", bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(
            F.expr(f"(count(*) * {int(scale)}) DIV any_value(__n)").alias(
                "xq"
            )
        )
    )


def _floordiv(s, n):
    """floor(s / n) for integer columns with possibly negative ``s``:
    subtract the non-negative ``pmod`` first so the division is exact
    and truncation == floor in every engine."""
    return F.expr(f"(({s}) - pmod(({s}), {n})) DIV {n}")


def train_hashed_perceptron(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 4096,
    rounds: int = 2,
    scale: int = SCALE,
    features: DataFrame | None = None,
) -> DataFrame:
    """Learn integer weights ``(bucket, w)`` separating ``positives``
    (label +1) from ``negatives`` (label -1). Deterministic: zero
    init, fixed round count, integer arithmetic — the same corpus
    always yields the same weights, bit for bit, on any engine.

    Labeled ids must be UNIQUE across (and within) the two frames:
    an id in both would merge two documents' token streams into one
    feature group whose length normalizer is partition-order
    dependent — the exact nondeterminism this design exists to
    prevent — so overlap raises instead.

    ``features`` optionally passes a precomputed
    :func:`classifier_features` frame covering the labeled ids
    (same ``n_buckets``/``scale``), so a pipeline that also SCORES
    the same corpus builds features once.

    Returns the weight table (only buckets seen in training; absent
    buckets are implicitly 0). Feed the per-doc margins through
    :func:`integer_classifier_margins`, or densify via
    :func:`trained_float_weights` for ``hashed_classifier_score``."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    labeled = positives.select(
        F.col(id_col), F.col(text_col), F.lit(1).alias("__y")
    ).unionByName(
        negatives.select(
            F.col(id_col), F.col(text_col), F.lit(-1).alias("__y")
        )
    )
    stats = labeled.agg(
        F.count(F.lit(1)).alias("__rows"),
        F.countDistinct(id_col).alias("__ids"),
    ).first()
    if int(stats["__rows"]) != int(stats["__ids"]):
        raise ValueError(
            "labeled ids must be unique across positives+negatives "
            f"({int(stats['__rows'])} rows, {int(stats['__ids'])} "
            "distinct ids) — overlap merges documents' features "
            "nondeterministically"
        )
    if features is None:
        features = classifier_features(
            labeled, text_col, id_col, n_buckets=n_buckets, scale=scale
        )
    feats = features.join(labeled.select(id_col, "__y"), id_col)
    from polars_text_spark.persist import track_persist

    feats = track_persist(feats.persist())
    n_docs = feats.select(id_col).distinct().count()
    if n_docs == 0:
        raise ValueError("no labeled documents with tokens to train on")

    weights: DataFrame | None = None  # all-zero
    for _ in range(rounds):
        if weights is None:
            miscls = feats  # zero weights: every doc misclassified
        else:
            margins = (
                feats.join(F.broadcast(weights), "bucket", "left")
                .groupBy(id_col, "__y")
                .agg(
                    F.sum(
                        F.col("xq") * F.coalesce(F.col("w"), F.lit(0))
                    ).alias("__m")
                )
            )
            err_ids = margins.filter(
                F.col("__y") * F.col("__m") <= 0
            ).select(id_col)
            miscls = feats.join(err_ids, id_col, "left_semi")
        upd = (
            miscls.groupBy("bucket")
            .agg(F.sum(F.col("__y") * F.col("xq")).alias("__s"))
            .select("bucket", _floordiv("__s", n_docs).alias("__d"))
        )
        if weights is None:
            weights = upd.select("bucket", F.col("__d").alias("w"))
        else:
            weights = (
                weights.join(upd, "bucket", "full")
                .select(
                    "bucket",
                    (
                        F.coalesce("w", F.lit(0))
                        + F.coalesce("__d", F.lit(0))
                    ).alias("w"),
                )
            )
        # truncate lineage so round r+1's plan doesn't replay rounds
        # 1..r (weights are n_buckets rows at most)
        weights = weights.localCheckpoint(eager=True)
    return weights


def integer_classifier_margins(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 4096,
    scale: int = SCALE,
    features: DataFrame | None = None,
) -> DataFrame:
    """Score documents with trained integer weights:
    ``(id_col, margin long, keep boolean)``, ``keep = margin > 0``
    (zero evidence — e.g. an all-out-of-vocabulary doc — REJECTS:
    a quality gate does not pass documents it knows nothing about).
    Same feature builder as training; docs with no tokens are absent.
    ``features`` reuses a precomputed :func:`classifier_features`
    frame (must cover ``df``'s ids, same ``n_buckets``/``scale``)."""
    require_free_columns(df, ("margin", "keep"), "integer_classifier_margins")
    feats = features if features is not None else classifier_features(
        df, text_col, id_col, n_buckets=n_buckets, scale=scale
    )
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("xq") * F.coalesce(F.col("w"), F.lit(0))).alias(
                "margin"
            )
        )
        .select(id_col, "margin", (F.col("margin") > 0).alias("keep"))
    )


def trained_float_weights(
    weights: DataFrame, *, n_buckets: int = 4096, scale: int = SCALE
) -> list[float]:
    """Densify a trained weight table into the ``weights=`` vector
    ``hashed_classifier_score`` deploys (float ``w/scale`` per
    bucket, absent buckets 0.0) — the train-here, score-anywhere
    bridge. Driver collect bounded by ``n_buckets`` rows (the
    k-means-centroids precedent). ``n_buckets`` MUST equal the
    training value: a mismatch re-buckets every token, which is
    silently-garbage scores in one direction and an IndexError in
    the other — so out-of-range buckets raise here.

    Decision parity: the integer gate rejects at margin <= 0, while
    ``hashed_classifier_score``'s default keeps ``margin >= 0.0``
    after 6-dp rounding — deploy with ``threshold=1e-6`` to preserve
    the reject-on-zero-evidence semantics (an all-OOV doc scores
    exactly 0.0 and must not pass). Decisions can still differ for
    float margins within 5e-7 of zero (the rounding grid); anything
    outside that band agrees."""
    dense = [0.0] * n_buckets
    for r in weights.collect():
        b = int(r["bucket"])
        if not (0 <= b < n_buckets):
            raise ValueError(
                f"bucket {b} outside n_buckets={n_buckets} — the "
                "weight table was trained with a different bucket "
                "count; pass the training n_buckets"
            )
        dense[b] = int(r["w"]) / float(scale)
    return dense
