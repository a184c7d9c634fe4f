"""Duplicated n-gram SPAN coverage — the "what fraction of this doc is
corpus-duplicated text" signal (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", exact-substring dedup
family; also RefinedWeb/Dolma's ``dup_ngram_frac`` quality columns).

Whole-doc MinHash answers "is this DOC a near-duplicate"; paragraph
dedup answers it for explicit chunk boundaries. This operator answers
the finer question real filters threshold on: how many of a document's
TOKENS sit inside at least one n-gram that repeats across the corpus —
with overlapping duplicated grams merged into spans so a 20-token
verbatim quote counts 20 tokens, not 16 overlapping 5-grams x 5.

Scale design:

- Grams are hashed to longs in ONE projection per doc (staged
  ``withColumn`` columns so Catalyst cannot re-inline the token array
  into the per-gram lambda — the O(G^2) trap documented in
  SCALING.md). Only (id, start, hash) rows ever shuffle; never text.
- Corpus-frequency is one groupBy on the gram hash (map-side partial
  aggregation), filtered to ``count >= min_df`` BEFORE joining back,
  so the join-back input is only the duplicated subset.
- Span merging is the classic sorted-interval sweep as a window
  partitioned by doc id (running max of interval end over preceding
  rows) — per-doc state, no cross-doc traffic, no driver collect.
- At 100 TB the frequency table is the only global structure; it is
  (hash, count) longs, orders of magnitude smaller than the corpus,
  and AQE can pick a broadcast join-back when ``min_df`` leaves a
  small duplicated set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_text_spark.operators._cols import require_free_columns

__all__ = ["dup_ngram_coverage", "strip_duplicate_spans"]


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(__sp_id, __sp_toks): filtered whitespace tokens of
    lower(trim(text)); null text tokenizes to an empty array."""
    d = df.select(
        F.col(id_col).alias("__sp_id"), F.col(text_col).alias("__sp_text")
    )
    return d.withColumn(
        "__sp_toks",
        F.when(
            F.col("__sp_text").isNotNull(),
            F.filter(
                F.split(F.trim(F.lower(F.col("__sp_text"))), r"\s+"),
                lambda t: t != F.lit(""),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def _v2_gram_structs(toks, n: int):
    """(start, g) structs under the v2 token-hash-window family
    (round 14): tokens xxhash64'd ONCE into a `let`-bound hash array
    (evaluated once per row — the O(G^2) re-inline trap, SCALING.md),
    gram hash = xxhash64 over the n token hashes; same derivation as
    :func:`polars_text_spark.operators.dedup.v2_gram_hashes` with the
    window start carried alongside. Caller guards ``size(toks) >= n``.
    """
    from polars_text_spark.plans.exprs import let

    return let(
        F.transform(toks, lambda t: F.xxhash64(t)),
        lambda th: F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.struct(
                (i - 1).cast("int").alias("start"),
                F.xxhash64(
                    *[F.element_at(th, i + j) for j in range(n)]
                ).alias("g"),
            ),
        ),
    )


def _dup_gram_starts(
    d: DataFrame, *, n: int, min_df: int, gram_hash
) -> DataFrame:
    """(__sp_id, start, g) rows for grams whose corpus-wide occurrence
    count reaches ``min_df``.

    struct(start, hash) per gram; sequence DESCENDS when nt < n, so
    guard and emit an empty array instead.
    explode_outer, NOT explode: explode makes InferFiltersFromGenerate
    insert a size()>0 filter that re-inlines the gram expression
    (SCALING.md); the null-filter below references only the POST-
    generate attribute, which cannot be pushed through the Generate.

    ``gram_hash=None`` (the production default since round 14, also
    selected by an explicit ``F.xxhash64``) builds the structs under
    the v2 token-hash-window family (:func:`_v2_gram_structs`) — no
    per-window string allocation. Any other callable (notably
    ``sha_token_hash``, which every spans oracle uses) keeps the
    engine-portable per-window ``concat_ws`` string build.

    ``pos`` feeds two consumers (the frequency agg and the join-back),
    so the gram projection runs twice from the scan. Deliberate:
    materializing the exploded gram stream to save the recompute
    would persist an intermediate the SIZE OF THE CORPUS (one row
    per token), while the recompute is embarrassingly-parallel
    map work — and under the v2 family, ~free. The sha path exists
    for oracle auditing, not the hot path.
    """
    nt = F.size(F.col("__sp_toks"))
    if gram_hash is None or gram_hash is F.xxhash64:
        gram_structs = _v2_gram_structs(F.col("__sp_toks"), n)
    else:
        gram_structs = F.transform(
            F.sequence(F.lit(0), nt - n),
            lambda i: F.struct(
                i.cast("int").alias("start"),
                gram_hash(
                    F.concat_ws(" ", F.slice(F.col("__sp_toks"), i + 1, n))
                ).alias("g"),
            ),
        )
    grams = d.withColumn(
        "__sp_grams",
        F.when(nt >= n, gram_structs).otherwise(
            F.array().cast("array<struct<start:int,g:bigint>>")
        ),
    )
    pos = (
        grams.select("__sp_id", F.explode_outer("__sp_grams").alias("pg"))
        .select(
            "__sp_id",
            F.col("pg.start").alias("start"),
            F.col("pg.g").alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    dup = (
        pos.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__sp_df"))
        .filter(F.col("__sp_df") >= min_df)
        .select("g")
    )
    return pos.join(dup, "g")


def dup_ngram_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 5,
    min_df: int = 2,
    gram_hash=None,
) -> DataFrame:
    """Per-document duplicated-span profile.

    A token n-gram is *duplicated* when it occurs >= ``min_df`` times
    corpus-wide (total occurrences, so in-document self-repetition
    counts — that is itself a quality signal). Returns one row per
    input row::

        id_col      (original name)
        n_tokens    whitespace tokens in lower(trim(text))
        n_grams     max(n_tokens - n + 1, 0)
        n_dup_grams grams of this doc that are duplicated
        dup_tokens  tokens covered by >=1 duplicated gram
                    (overlapping grams merged into spans)
        dup_frac    dup_tokens / n_tokens, rounded to 6 dp (0 when
                    the doc has no tokens)

    ``gram_hash=None`` (default since round 14) is the v2
    token-hash-window family — the fastest production path, and
    output-identical to any injective family because every output
    column is a COUNT over gram-identity (absent a 2^-64 collision).
    Pass :func:`polars_text_spark.operators.dedup.sha_token_hash` for
    the engine-portable string-gram build a SQL oracle re-derives
    hash-for-hash (the driver oracle replays string grams against the
    v2 default — the differential gate doubles as a family-equivalence
    proof). Docs shorter than ``n`` tokens have zero grams and zero
    coverage by definition.

    ``id_col`` must be UNIQUE: duplicate ids merge the (id, start,
    gram) streams of distinct rows — same-id self-collisions count
    toward ``min_df`` and spans from different rows merge — and the
    final join-back fans out, silently breaking the one-row-per-input
    contract (same requirement as the dedup pair operators).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if min_df < 2:
        raise ValueError("min_df must be >= 2 (1 would flag every gram)")
    require_free_columns(
        df,
        ("__sp_id", "__sp_text", "__sp_toks", "__sp_grams"),
        "dup_ngram_coverage",
    )
    d = _tokenized(df, text_col, id_col)
    nt = F.size(F.col("__sp_toks"))
    # The per-doc profile side never touches gram hashes: n_grams is
    # arithmetic (max(nt-n+1, 0)), NOT size(<gram expr>) — sizing the
    # gram array would inline the whole O(G) gram pipeline into this
    # branch a second time (plan-asserted in test_round6_plans).
    base = d.select(
        "__sp_id",
        nt.cast("long").alias("n_tokens"),
        F.greatest(nt - (n - 1), F.lit(0)).cast("long").alias("n_grams"),
    )

    dup_pos = _dup_gram_starts(d, n=n, min_df=min_df, gram_hash=gram_hash)

    # sorted-interval sweep: a gram covers [start, start+n); new
    # coverage is whatever extends past the running max end so far
    w = (
        Window.partitionBy("__sp_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.coalesce(F.max(F.col("start") + n).over(w), F.lit(0))
    add = F.greatest(
        F.lit(0), (F.col("start") + n) - F.greatest(F.col("start"), prev_end)
    )
    per_doc = (
        dup_pos.select("__sp_id", add.alias("__sp_add"))
        .groupBy("__sp_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_grams"),
            F.sum("__sp_add").cast("long").alias("dup_tokens"),
        )
    )

    return (
        base.join(per_doc, "__sp_id", "left")
        .select(
            F.col("__sp_id").alias(id_col),
            "n_tokens",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.coalesce("dup_tokens", F.lit(0)).cast("double")
                    / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 5,
    min_df: int = 2,
    gram_hash=None,
) -> DataFrame:
    """The REMOVAL step of exact-substring dedup (Lee et al. 2022):
    rebuild every document from its normalized token stream with all
    tokens covered by a corpus-duplicated n-gram dropped.

    Returns ``(id_col, text)`` for every input row; the rebuilt text
    is the surviving tokens of ``lower(trim(text))`` joined by single
    spaces (docs whose every token is covered — verbatim boilerplate —
    come back as ``''``). Unlike the per-doc keep-first policy of
    ``strip_duplicate_chunks``, span-dedup drops EVERY occurrence: the
    duplicated passage itself is what poisons training loss.

    Scale shape: duplicated gram starts come from
    :func:`dup_ngram_coverage`'s count-then-join pipeline (hash longs
    shuffle); coverage expands each start by a bounded factor ``n``
    (``sequence(start, start+n-1)`` explode, deduped map-side by the
    aggregate); the rebuild is one anti-join of (id, pos, token)
    against covered (id, pos) and one ordered per-doc aggregate. The
    token stream shuffles once — unavoidable, the output IS new text.

    ``id_col`` must be UNIQUE — see :func:`dup_ngram_coverage` (the
    shared gram pipeline merges streams per id, so duplicate ids
    cross-contaminate coverage and fan out the rebuild join).

    ``gram_hash`` follows :func:`dup_ngram_coverage`: None (default)
    = the v2 token-hash-window production family; the rebuilt TEXT is
    hash-family-independent (gram identity = token-window equality
    absent a 2^-64 collision), which the driver oracle proves by
    replaying string grams against this default.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if min_df < 2:
        raise ValueError("min_df must be >= 2 (1 would strip every doc)")
    require_free_columns(
        df,
        ("__sp_id", "__sp_text", "__sp_toks", "__sp_grams"),
        "strip_duplicate_spans",
    )
    d = _tokenized(df, text_col, id_col)
    dup_pos = _dup_gram_starts(d, n=n, min_df=min_df, gram_hash=gram_hash)

    covered = (
        dup_pos.select(
            "__sp_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("p"),
        )
        .groupBy("__sp_id", "p")
        .agg(F.lit(1).alias("__sp_one"))
        .select("__sp_id", "p")
    )

    tokpos = d.select(
        "__sp_id", F.posexplode_outer("__sp_toks").alias("p", "tok")
    ).filter(F.col("tok").isNotNull())

    kept = tokpos.join(covered, ["__sp_id", "p"], "left_anti")
    rebuilt = kept.groupBy("__sp_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("p"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text")
    )
    return (
        d.select("__sp_id")
        .join(rebuilt, "__sp_id", "left")
        .select(
            F.col("__sp_id").alias(id_col),
            F.coalesce("text", F.lit("")).alias("text"),
        )
    )
