"""Winnowing document fingerprints (MOSS-style) for partial-overlap
detection — beyond-reference; the robust complement to whole-doc
hashing (exact dup) and MinHash (whole-doc near-dup): winnowing
catches documents sharing PASSAGES (quotes, syndicated sections,
copied paragraphs) even when the rest of the text is unrelated.

Algorithm (Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms
for Document Fingerprinting", SIGMOD 2003): hash every token k-gram,
slide a window of ``w`` consecutive k-gram hashes, keep the minimum
of each window, dedupe. Guarantees: any shared run of at least
``w + k - 1`` tokens produces at least one shared fingerprint, and
the fingerprint density is ~2/(w+1) — a tunable sketch, not a full
shingle set.

Scale shape: fingerprint selection is a single projection of
higher-order array built-ins (no explode until the join); the overlap
join is an equi-join on fingerprint longs with an optional document-
frequency cap to keep viral fingerprints from creating hot keys.
Gram hashing uses the v2 token-hash-window family by default (round
14): tokens are xxhash64'd once per row and each gram hash covers the
token-hash window — no per-window string allocation (the measured
11.3x string-build tax, SCALING.md round-13/14).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "with_winnow_fingerprints",
]


def _gram_hash_array(toks, k: int, gram_hash):
    """k-gram hash array of a token array, in window order.

    ``gram_hash=None`` (the production default since round 14) is the
    v2 token-hash-window family (:func:`polars_text_spark.operators.
    dedup.v2_gram_hashes` — tokens xxhash64'd once per row into a
    `let`-bound hash array, gram hash = xxhash64 over the token-hash
    window; 11.3x over per-window string builds, SCALING.md). A
    callable ``gram_hash`` (string Column -> long Column, e.g.
    ``sha_token_hash`` for the engine-portable oracle family) keeps
    the per-window ``concat_ws`` string build. Caller guards
    ``size(toks) >= k``."""
    if gram_hash is None:
        from polars_text_spark.operators.dedup import v2_gram_hashes

        return v2_gram_hashes(toks, k)
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: gram_hash(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )


def _short_run_hash(toks, gram_hash) -> Column:
    """Fingerprint of a WHOLE short token run (< k tokens), mirroring
    the short-doc shingle convention (token_shingles' count<=0
    branch): hash of the space-joined run, under whichever family the
    gram hashes use (xxhash64 of the joined string for the v2
    default — identical to token_shingles' short branch)."""
    hasher = gram_hash if gram_hash is not None else F.xxhash64
    return hasher(F.concat_ws(" ", toks))


def winnow_fingerprints(
    text_col,
    *,
    k: int = 5,
    w: int = 4,
    gram_hash=None,
) -> Column:
    """``array<long>`` of distinct winnowing fingerprints of the
    whitespace-tokenized (lowercased, empty-token-filtered) text.

    - fewer than ``k`` tokens (but >= 1): one fingerprint of the whole
      token run (mirrors the short-doc shingle convention);
    - no tokens / NULL: empty array / NULL;
    - fewer than ``w`` k-grams: the global minimum k-gram hash.

    ``gram_hash=None`` (default) selects the v2 token-hash-window
    family (round 14; see :func:`_gram_hash_array`) — fingerprint
    VALUES therefore changed vs the pre-round-14 xxhash-over-string
    build; fingerprints are an in-flight sketch no production
    artifact persists, and all overlap semantics (the w+k-1
    guarantee, density, distinctness) are family-independent. Pass
    :func:`polars_text_spark.operators.dedup.sha_token_hash` for the
    engine-portable string-gram variant a DuckDB oracle reproduces
    exactly.

    Tokens, token hashes, and gram hashes are each bound through
    :func:`~polars_text_spark.plans.exprs.let` (lambda-variable
    let-binding), so each is evaluated ONCE per row even in this
    single-Column form — without the binding the ``grams`` subtree
    inlines into every window-min lambda and every window re-hashes
    EVERY gram, O(G^2) per row (the r5 form timed out at sf0.1 on
    exactly that; :func:`with_winnow_fingerprints` stays as the
    projection-staged equivalent for pipelines that want named
    intermediate columns).
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    from polars_text_spark.plans.exprs import let

    c = F.col(text_col) if isinstance(text_col, str) else text_col

    def with_toks(toks):
        n = F.size(toks)
        grams_val = F.when(n >= k, _gram_hash_array(toks, k, gram_hash))

        def with_grams(grams):
            ng = F.size(grams)
            window_mins = F.transform(
                F.sequence(F.lit(0), ng - w),
                lambda j: F.array_min(F.slice(grams, j + 1, w)),
            )
            return (
                F.when(n == 0, F.array().cast("array<long>"))
                .when(n < k, F.array(_short_run_hash(toks, gram_hash)))
                .when(ng < w, F.array(F.array_min(grams)))
                .otherwise(F.array_distinct(window_mins))
            )

        return let(grams_val, with_grams)

    return let(
        F.filter(F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != F.lit("")),
        with_toks,
    )


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    out_col: str = "fingerprints",
    *,
    k: int = 5,
    w: int = 4,
    gram_hash=None,
) -> DataFrame:
    """Append ``out_col`` = winnowing fingerprints of ``text_col``
    (same contract and same hash families as
    :func:`winnow_fingerprints`), factored so tokens and gram hashes
    are each computed ONCE per row: ``__wn_toks`` and ``__wn_grams``
    are staged as projection columns referenced more than once, so
    CollapseProject keeps the boundaries instead of re-inlining the
    O(G) hash array into every window-min lambda (which is O(G^2) per
    row and timed out at sf0.1). Under the v2 default the token-hash
    array INSIDE ``__wn_grams`` is additionally `let`-bound by
    :func:`~polars_text_spark.operators.dedup.v2_gram_hashes`, so it
    too evaluates once per row, not once per window."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    from polars_text_spark.operators._cols import require_free_columns

    require_free_columns(
        df, ("__wn_toks", "__wn_grams"), "with_winnow_fingerprints"
    )
    d = df.withColumn(
        "__wn_toks",
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda t: t != F.lit(""),
        ),
    )
    n = F.size(F.col("__wn_toks"))
    # guard: sequence DESCENDS for n<k — only build grams when there
    # are at least k tokens
    d = d.withColumn(
        "__wn_grams",
        F.when(n >= k, _gram_hash_array(F.col("__wn_toks"), k, gram_hash)),
    )
    ng = F.size(F.col("__wn_grams"))
    fps = (
        F.when(n == 0, F.array().cast("array<long>"))
        .when(n < k, F.array(_short_run_hash(F.col("__wn_toks"), gram_hash)))
        .when(
            ng < w, F.array(F.array_min(F.col("__wn_grams")))
        )
        .otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), ng - w),
                    lambda j: F.array_min(
                        F.slice(F.col("__wn_grams"), j + 1, w)
                    ),
                )
            )
        )
    )
    d = d.withColumn(
        out_col, F.when(F.col(text_col).isNotNull(), fps)
    )
    return d.drop("__wn_toks", "__wn_grams")


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
    gram_hash=None,
) -> DataFrame:
    """Pairs of documents sharing at least ``min_shared`` winnowing
    fingerprints: ``(id_a, id_b, n_shared)`` with ``id_a < id_b``.

    ``max_df`` drops fingerprints occurring in more than that many
    documents before pairing — the standard viral-passage guard: a
    boilerplate sentence in a million docs would otherwise create a
    million-row hot bucket; capped fingerprints are exactly the ones
    that carry no discriminative signal.
    """
    staged = with_winnow_fingerprints(
        df.filter(F.col(text_col).isNotNull()).select(id_col, text_col),
        text_col,
        "__fps",
        k=k,
        w=w,
        gram_hash=gram_hash,
    )
    # explode_OUTER + post-filter, NOT plain explode: for a non-outer
    # explode the optimizer's InferFiltersFromGenerate adds
    # `size(__fps) > 0`, and predicate pushdown substitutes the alias
    # — re-inlining the ENTIRE nested fingerprint expression into the
    # filter in its unfactored O(G^2) form (measured: >100 s vs ~5 s
    # at sf0.1). The rule skips outer generates; dropping the null
    # row afterward filters on the generated attribute only.
    fps = staged.select(
        F.col(id_col).alias("id"), F.explode_outer("__fps").alias("fp")
    ).filter(F.col("fp").isNotNull())
    if max_df is not None:
        df_counts = fps.groupBy("fp").agg(
            F.count(F.lit(1)).alias("__df")
        )
        fps = (
            fps.join(df_counts.filter(F.col("__df") <= max_df), "fp")
            .drop("__df")
        )
    left = fps.select(F.col("id").alias("id_a"), "fp")
    right = fps.select(F.col("id").alias("id_b"), "fp")
    return (
        left.join(right, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
