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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "with_winnow_fingerprints",
]


def _xxhash_gram(g: Column) -> Column:
    return F.xxhash64(g)


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

    ``gram_hash`` (string Column -> long Column) defaults to
    ``xxhash64``; pass :func:`polars_text_spark.operators.dedup.
    sha_token_hash` for the engine-portable variant a DuckDB oracle
    reproduces exactly.

    Tokens and gram hashes are bound through :func:`~polars_text_spark.
    plans.exprs.let` (lambda-variable let-binding), so each is
    evaluated ONCE per row even in this single-Column form — without
    the binding the ``grams`` subtree inlines into every window-min
    lambda and every window re-hashes EVERY gram, O(G^2) per row (the
    r5 form timed out at sf0.1 on exactly that;
    :func:`with_winnow_fingerprints` stays as the projection-staged
    equivalent for pipelines that want named intermediate columns).
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    from polars_text_spark.plans.exprs import let

    hasher = gram_hash if gram_hash is not None else _xxhash_gram
    c = F.col(text_col) if isinstance(text_col, str) else text_col

    def with_toks(toks):
        n = F.size(toks)
        grams_val = F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: hasher(F.concat_ws(" ", F.slice(toks, i + 1, k))),
            ),
        )

        def with_grams(grams):
            ng = F.size(grams)
            window_mins = F.transform(
                F.sequence(F.lit(0), ng - w),
                lambda j: F.array_min(F.slice(grams, j + 1, w)),
            )
            return (
                F.when(n == 0, F.array().cast("array<long>"))
                .when(n < k, F.array(hasher(F.concat_ws(" ", toks))))
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
    (same contract as :func:`winnow_fingerprints`), factored so tokens
    and gram hashes are each computed ONCE per row: ``__wn_toks`` and
    ``__wn_grams`` are staged as projection columns referenced more
    than once, so CollapseProject keeps the boundaries instead of
    re-inlining the O(G) hash array into every window-min lambda
    (which is O(G^2) per row and timed out at sf0.1)."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    from polars_text_spark.operators._cols import require_free_columns

    require_free_columns(
        df, ("__wn_toks", "__wn_grams"), "with_winnow_fingerprints"
    )
    hasher = gram_hash if gram_hash is not None else _xxhash_gram
    d = df.withColumn(
        "__wn_toks",
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda t: t != F.lit(""),
        ),
    )
    n = F.size(F.col("__wn_toks"))
    # guard: sequence(0, n-k) DESCENDS for n<k — only build grams when
    # there are at least k tokens
    d = d.withColumn(
        "__wn_grams",
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: hasher(
                    F.concat_ws(" ", F.slice(F.col("__wn_toks"), i + 1, k))
                ),
            ),
        ),
    )
    ng = F.size(F.col("__wn_grams"))
    fps = (
        F.when(n == 0, F.array().cast("array<long>"))
        .when(n < k, F.array(hasher(F.concat_ws(" ", F.col("__wn_toks")))))
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
