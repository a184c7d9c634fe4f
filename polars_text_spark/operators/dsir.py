"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
feature distribution resembles a small high-quality TARGET corpus
(e.g. Wikipedia + books), the standard pretraining-data selection
recipe between "no filtering" and "train a quality classifier".

Pipeline (all JVM built-ins, engine-portable by construction):

1. **Features** — each document becomes a bag of word uni/bi-grams,
   hashed into ``buckets`` slots with the repo's 60-bit sha recipe
   (:func:`hashed_ngram_bucket`), so the feature space is fixed-size
   no matter the vocabulary. Same hash in the DuckDB oracle.
2. **Fit** (:func:`dsir_fit`) — bucket unigram counts for the raw and
   target corpora; the fitted artifact is a complete ``buckets``-row
   table ``(bucket, log_ratio)`` with add-1-smoothed
   ``ln p_target[b] - ln p_raw[b]``. Save it as parquet and reuse it
   across runs — fitting never has to rerun with the corpus.
3. **Score** (:func:`dsir_log_weights`) — a document's log importance
   weight is the sum of ``log_ratio`` over its feature occurrences
   (the log of the paper's importance weight).
4. **Select** (:func:`dsir_sample`) — expectation-mode resampling:
   keep a document with probability
   ``min(1, exp(beta * (log_weight / n_features - tau)))`` using the
   content-keyed uniform draw of
   :func:`~polars_text_spark.operators.sampling.key_uniform`.
   Length-normalizing by ``n_features`` keeps long documents from
   dominating the exponent; ``beta`` sharpens, ``tau`` shifts the
   operating point. (The paper's Gumbel top-k draws an EXACT sample
   size but is a global sort at corpus scale; the keep-probability
   form is map-only and engine-replayable, and
   ``orderBy(gumbel_key).limit(n)`` remains composable for modest n.)

Scale notes (100 TB): the two fit aggregations group on at most
``buckets`` keys, so map-side partial aggregation bounds every
mapper's shuffle output at ``buckets`` rows regardless of corpus
size; the fitted table is tiny and BROADCAST into the scoring join
(never a shuffle of the feature stream); per-document scoring groups
on the doc id, and because a document's exploded features stay in its
input partition the partial aggregate collapses them locally — the
scoring shuffle moves ~1 slim row per document, and the text column
never enters any shuffle. The final selection is a map-only filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import (
    word_ngram_array,
    ws_token_array,
)
from polars_text_spark.operators._cols import require_free_columns
from polars_text_spark.operators.sampling import key_uniform

__all__ = [
    "dsir_fit",
    "dsir_fit_weights",
    "dsir_log_weights",
    "dsir_sample",
    "dsir_topk",
    "hashed_ngram_bucket",
    "hashed_ngram_counts",
]


def hashed_ngram_bucket(ngram: Column, buckets: int, salt: str = "") -> Column:
    """Feature-hash an n-gram string into ``[0, buckets)``: the 60-bit
    sha256 prefix (the dedup/sampling recipe — lowercase hex in both
    engines) mod ``buckets``. DuckDB twin:
    ``('0x' || substr(sha256(ngram || salt), 1, 15))::BIGINT % buckets``.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    h = F.sha2(F.concat(ngram.cast("string"), F.lit(salt)), 256)
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(buckets)
    ).alias("bucket")


def _feature_grams(text: Column, max_n: int) -> Column:
    """Concatenated word 1..max_n-gram array of a text column (shared
    ws_token_array + word_ngram_array contract, so the n-gram strings
    are identical to ngram_counts / novelty)."""
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    toks = ws_token_array(text)
    grams = word_ngram_array(toks, 1)
    for n in range(2, max_n + 1):
        grams = F.concat(grams, word_ngram_array(toks, n))
    return grams


def _feature_stream(
    df: DataFrame,
    text_col: str,
    *,
    buckets: int,
    max_n: int,
    salt: str,
    id_col: str | None = None,
) -> DataFrame:
    """One row per n-gram OCCURRENCE: ``(bucket)`` or
    ``(id_col, bucket)``. The explode projects only the id and the
    hashed bucket — the text never leaves the scan projection."""
    keep = [id_col] if id_col else []
    exploded = df.filter(F.col(text_col).isNotNull()).select(
        *keep, F.explode(_feature_grams(F.col(text_col), max_n)).alias("__ngram")
    )
    return exploded.select(
        *keep, hashed_ngram_bucket(F.col("__ngram"), buckets, salt)
    )


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 10_000,
    max_n: int = 2,
    salt: str = "",
) -> DataFrame:
    """Corpus bucket counts ``(bucket, cnt)`` — the sufficient
    statistic DSIR fits on. At most ``buckets`` output rows, so the
    groupBy's map-side partial combine caps every mapper's shuffle
    contribution at ``buckets`` rows."""
    return (
        _feature_stream(df, text_col, buckets=buckets, max_n=max_n, salt=salt)
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_fit(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 10_000,
    max_n: int = 2,
    salt: str = "",
) -> DataFrame:
    """Fit the DSIR importance model: a COMPLETE ``buckets``-row table
    ``(bucket, log_ratio)`` where
    ``log_ratio = ln((t_cnt+1)/(t_total+B)) - ln((r_cnt+1)/(r_total+B))``
    (add-1 smoothing over the B hash buckets, so buckets unseen in
    either corpus — and hence feature streams scored later against a
    SAMPLED fit — still get a finite, principled ratio).

    The completeness makes the downstream scoring join an inner join
    with no dropped features, and the table a self-contained artifact:
    write it to parquet once and score any number of corpora against
    it without refitting."""
    spark = raw_df.sparkSession
    raw_counts = hashed_ngram_counts(
        raw_df, text_col, buckets=buckets, max_n=max_n, salt=salt
    ).withColumnRenamed("cnt", "__r_cnt")
    tgt_counts = hashed_ngram_counts(
        target_df, text_col, buckets=buckets, max_n=max_n, salt=salt
    ).withColumnRenamed("cnt", "__t_cnt")
    r_total = raw_counts.agg(F.sum("__r_cnt").alias("__r_total"))
    t_total = tgt_counts.agg(F.sum("__t_cnt").alias("__t_total"))
    base = spark.range(buckets).select(F.col("id").alias("bucket"))
    b = float(buckets)
    return (
        base.join(F.broadcast(raw_counts), "bucket", "left")
        .join(F.broadcast(tgt_counts), "bucket", "left")
        .crossJoin(F.broadcast(r_total))
        .crossJoin(F.broadcast(t_total))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("__t_cnt", F.lit(0)) + 1.0)
                    / (F.coalesce("__t_total", F.lit(0)) + b)
                )
                - F.log(
                    (F.coalesce("__r_cnt", F.lit(0)) + 1.0)
                    / (F.coalesce("__r_total", F.lit(0)) + b)
                )
            ).alias("log_ratio"),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    ratio_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    buckets: int = 10_000,
    max_n: int = 2,
    salt: str = "",
) -> DataFrame:
    """Per-document log importance weight against a fitted
    :func:`dsir_fit` table: ``(id_col, n_features, log_weight)`` with
    ``log_weight = sum(log_ratio)`` over the document's n-gram
    occurrences. Documents with no features (null/whitespace text) are
    absent — there is nothing to weigh.

    ``buckets``/``max_n``/``salt`` MUST match the fit — they define
    the feature space. The ratio table is broadcast; the only shuffle
    is the per-document partial-aggregated sum."""
    feats = _feature_stream(
        df, text_col, buckets=buckets, max_n=max_n, salt=salt, id_col=id_col
    )
    return (
        feats.join(F.broadcast(ratio_table), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_features"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )


def dsir_fit_weights(
    df: DataFrame,
    target_flag: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    buckets: int = 10_000,
    max_n: int = 2,
    salt: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Fused fit + score for the common case where the target corpus
    is a SUBSET of the raw corpus selected by a boolean expression
    (``lang == 'en'``, a quality flag, ...): ONE feature-hash pass
    over the corpus feeds the raw fit, the target fit AND the
    per-document weights. The layered ``dsir_fit(raw, target)`` +
    ``dsir_log_weights(raw, ratio)`` recipe tokenizes+hashes the
    corpus THREE times (raw counts, target counts, scoring stream) —
    and, with the count frames unpersisted, each fit total re-derived
    its aggregate once more: FIVE corpus scans in the physical plan
    (plans/r16/dsir_weights_before.txt). At 100 TB the feature pass
    (explode + sha2 per n-gram occurrence) IS the cost of DSIR; this
    runs it once (guide §1.2: fix the pass count before the
    per-task work).

    Shape: the single pass aggregates to a per-``(doc, bucket)``
    count frame (partial map-side combine — a document's features
    collapse locally), which is persisted and is at most
    |docs| x |buckets| but in practice ~distinct-buckets-per-doc
    rows; every fit aggregate and the per-doc weight derive from it
    without touching the corpus again.

    Value-identical to the layered form modulo float-summation order
    (``log_weight`` sums ``n * log_ratio`` per distinct (doc, bucket)
    instead of re-adding ``log_ratio`` per occurrence; consumers
    round to 6 dp before comparison, same as the cross-engine oracle
    contract — hash-verified against the unchanged DuckDB oracles).
    Returns ``(ratio_table, weights)`` with exactly the
    :func:`dsir_fit` / :func:`dsir_log_weights` schemas."""
    spark = df.sparkSession
    from polars_text_spark.persist import track_persist

    feats = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.when(target_flag, F.lit(1)).otherwise(F.lit(0)).alias("__is_t"),
        F.explode(_feature_grams(F.col(text_col), max_n)).alias("__ngram"),
    )
    per_doc = track_persist(
        feats.select(
            id_col, "__is_t", hashed_ngram_bucket(F.col("__ngram"), buckets, salt)
        )
        .groupBy(id_col, "__is_t", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .persist()
    )
    bucket_counts = track_persist(
        per_doc.groupBy("bucket")
        .agg(
            F.sum("__n").alias("__r_cnt"),
            F.sum(
                F.when(F.col("__is_t") == 1, F.col("__n")).otherwise(F.lit(0))
            ).alias("__t_cnt"),
        )
        .persist()
    )
    totals = bucket_counts.agg(
        F.sum("__r_cnt").alias("__r_total"),
        F.sum("__t_cnt").alias("__t_total"),
    )
    base = spark.range(buckets).select(F.col("id").alias("bucket"))
    b = float(buckets)
    ratio = (
        base.join(F.broadcast(bucket_counts), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("__t_cnt", F.lit(0)) + 1.0)
                    / (F.coalesce("__t_total", F.lit(0)) + b)
                )
                - F.log(
                    (F.coalesce("__r_cnt", F.lit(0)) + 1.0)
                    / (F.coalesce("__r_total", F.lit(0)) + b)
                )
            ).alias("log_ratio"),
        )
    )
    weights = (
        per_doc.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_features"),
            F.sum(F.col("__n") * F.col("log_ratio")).alias("log_weight"),
        )
    )
    return ratio, weights


def dsir_sample(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    *,
    beta: float = 1.0,
    tau: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Expectation-mode importance resampling: keep a document iff
    ``key_uniform(id, salt) < min(1, exp(beta * (log_weight /
    n_features - tau)))``. Content-keyed and map-only after the
    weights join, so the kept set is stable under reruns,
    repartitioning, and engine replay; raising ``beta`` sharpens
    toward the target distribution, ``tau`` sets the score at which
    keep-probability saturates at 1.

    ``weights`` is the :func:`dsir_log_weights` frame (or a parquet
    round-trip of it). Documents absent from ``weights`` (no
    features) are dropped — an unweighable document has no place in
    an importance-resampled corpus."""
    require_free_columns(df, ("n_features", "log_weight"), "dsir_sample")
    scored = df.join(weights, id_col)
    keep_p = F.least(
        F.lit(1.0),
        F.exp(
            F.lit(float(beta))
            * (F.col("log_weight") / F.col("n_features") - F.lit(float(tau)))
        ),
    )
    return scored.filter(key_uniform(F.col(id_col), salt) < keep_p).drop(
        "n_features", "log_weight"
    )


def dsir_topk(
    df: DataFrame,
    weights: DataFrame,
    n: int,
    id_col: str = "doc_id",
    *,
    beta: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """The paper's EXACT-size selection: Gumbel top-k over the
    importance weights — ``key_i = beta * avg_log_ratio_i + G_i``
    with ``G_i = -ln(-ln(u_i))`` and the content-keyed uniform
    ``u_i``, so the n rows with the largest keys are a without-
    replacement sample with inclusion probability proportional to the
    (tempered) importance weight. Deterministic given (ids, salt).

    Top-n runs as ``orderBy(...).limit(n)`` — Spark's
    TakeOrderedAndProject keeps n rows per partition and merges on
    the driver, so this is the MODEST-n path (n x partitions driver
    rows); for corpus-sized selections use :func:`dsir_sample`, whose
    expectation-mode filter is map-only (the documented trade in the
    module header). Ties (astronomically unlikely with 60-bit draws)
    break on the id for full determinism."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    require_free_columns(df, ("n_features", "log_weight"), "dsir_topk")
    scored = df.join(weights, id_col)
    u = key_uniform(F.col(id_col), salt)
    # u in [0, 1): guard the u == 0 edge (-ln(-ln 0) undefined) with
    # the smallest representable draw instead
    safe_u = F.greatest(u, F.lit(1.0 / (1 << 60)))
    gumbel = -F.log(-F.log(safe_u))
    key = (
        F.lit(float(beta)) * (F.col("log_weight") / F.col("n_features"))
        + gumbel
    )
    return (
        scored.withColumn("__gk", key)
        .orderBy(F.col("__gk").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("__gk", "n_features", "log_weight")
    )
