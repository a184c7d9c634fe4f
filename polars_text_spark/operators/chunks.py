"""Sub-document (paragraph/chunk) deduplication statistics
(beyond-reference, RefinedWeb/FineWeb-style curation).

Whole-document dedup misses the dominant duplication mode in web
corpora: boilerplate PARAGRAPHS (nav bars, license blocks, cookie
banners) repeated across otherwise-distinct pages. This operator
splits each document into chunks, fingerprints every chunk, and
reports per-document how much of it is corpus-wide repeated material
— the standard signal for "strip the boilerplate / drop the doc".

Scale shape: chunks shuffle as (sha256, count) pairs — the text
itself never leaves the initial scan projection; the corpus-wide
chunk-frequency table is ONE hash aggregate on the 64-hex fingerprint,
joined back by fingerprint (both sides pre-hashed, equi-join). At
100 TB this is two shuffles of fixed-width keys, no array payloads.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "explode_chunks",
    "chunk_dup_stats",
    "strip_duplicate_chunks",
    "strip_common_lines",
]


def explode_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sep: str = "\n\n",
    carry: list[str] | None = None,
) -> DataFrame:
    """One row per non-blank chunk: ``(id_col, *carry, chunk_idx,
    chunk)``. Chunks are trimmed; ``chunk_idx`` is the 0-based
    position among the KEPT (non-blank) chunks, so downstream slice
    bookkeeping is dense. NULL text yields no rows. ``carry`` names
    extra per-document columns to replicate onto every chunk row
    (e.g. a grouping key) without a join-back.

    ``sep`` is a LITERAL separator (it is regex-escaped before the
    split, since :func:`strip_duplicate_chunks` rejoins with it
    literally — an unescaped ``'|'`` would otherwise explode the text
    into single characters)."""
    # lambda, NOT a bare F.trim reference: trim() has an optional
    # second param (the charset), so transform() would bind the
    # element INDEX to it and silently not trim
    trimmed = F.transform(
        F.split(F.col(text_col), F.lit(re.escape(sep))), lambda x: F.trim(x)
    )
    kept = F.filter(trimmed, lambda x: x != F.lit(""))
    # posexplode_OUTER + null filter: a non-outer generate makes the
    # optimizer infer `size(kept) > 0` and pushdown re-inlines the
    # whole split/transform/filter chain into that filter (the
    # InferFiltersFromGenerate trap — see operators/winnow.py, where
    # the nested variant of this was a >50x slowdown).
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            id_col,
            *(carry or []),
            F.posexplode_outer(kept).alias("chunk_idx", "chunk"),
        )
        .filter(F.col("chunk").isNotNull())
    )


def chunk_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sep: str = "\n\n",
) -> DataFrame:
    """Per-document chunk-duplication profile: ``(id_col, n_chunks,
    n_dup_chunks, dup_chunk_frac)`` where a chunk counts as duplicated
    when its exact (trimmed) text occurs more than once corpus-wide —
    including repeats inside the same document. Docs with no
    non-blank chunks are absent (no chunks, no signal)."""
    chunks = explode_chunks(df, text_col, id_col, sep=sep).select(
        id_col, F.sha2(F.col("chunk"), 256).alias("__fp")
    )
    freq = chunks.groupBy("__fp").agg(F.count(F.lit(1)).alias("__n"))
    return (
        chunks.join(freq, "__fp")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("__n") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_chunk_frac",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 6),
        )
    )


def strip_duplicate_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sep: str = "\n\n",
    max_occurrences: int = 1,
    keep_first: bool = True,
) -> DataFrame:
    """Rebuild each document with corpus-wide repeated chunks REMOVED
    (the RefinedWeb boilerplate-strip step): a chunk survives if its
    exact (trimmed) text occurs at most ``max_occurrences`` times
    corpus-wide, or — with ``keep_first`` — if this occurrence is the
    globally first one (ordered by ``(id_col, chunk_idx)``), so one
    copy of every boilerplate block remains in the corpus.

    Returns ``(id_col, text)`` for every doc that had at least one
    non-blank chunk; a doc stripped to nothing keeps an empty string.
    Deterministic: survivors rejoin in original chunk order.

    Scale shape: the duplicate decision is a per-fingerprint hash
    AGGREGATE (count + lexicographic-min occurrence) joined back on
    the fingerprint — partial aggregation combines map-side, so a
    viral boilerplate chunk in 10^6 docs never lands on one straggler
    task (a ``Window.partitionBy(fingerprint)`` would put every
    occurrence of the hot fingerprint in a single window partition).
    The rebuild groupBy shuffles surviving chunk text once on the doc
    id — the unavoidable cost of reconstructing documents.
    """
    if max_occurrences < 1:
        raise ValueError("max_occurrences must be >= 1")
    chunks = explode_chunks(df, text_col, id_col, sep=sep).withColumn(
        "__fp", F.sha2(F.col("chunk"), 256)
    )
    freq = chunks.groupBy("__fp").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).alias("__first"),
    )
    flagged = chunks.join(freq, "__fp")
    keep = F.col("__n") <= max_occurrences
    if keep_first:
        keep = keep | (
            F.struct(F.col(id_col), F.col("chunk_idx")) == F.col("__first")
        )
    survivors = flagged.filter(keep)
    rebuilt = survivors.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk"))
                ),
                lambda s: s["chunk"],
            ),
            sep,
        ).alias(text_col)
    )
    all_docs = chunks.select(id_col).distinct()
    return all_docs.join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )


def strip_common_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    *,
    sep: str = "\n",
    min_docs: int = 2,
    min_doc_frac: float | None = None,
) -> DataFrame:
    """Rebuild each document with COMMON lines removed — the CCNet /
    site-template strip: a (trimmed, non-blank) line is boilerplate
    when it appears in at least ``min_docs`` DISTINCT documents of its
    ``group_col`` group (a web domain, a crawl source; ``None`` =
    corpus-wide), and additionally in at least ``min_doc_frac`` of the
    group's documents when set. ALL copies of a boilerplate line are
    dropped (nav menus and cookie banners carry no information worth
    keeping once), unlike :func:`strip_duplicate_chunks`'s
    keep-first-occurrence contract for content paragraphs.

    Distinct-DOC counting (not occurrence counting) is what makes
    this a template detector: a line repeated 50 times inside ONE doc
    is repetition, not boilerplate, and survives here (repetition has
    its own signal, ``dup_word_frac``/``repetition_signals``).

    Returns ``(id_col, text)`` for every doc that had at least one
    non-blank line; a doc stripped to nothing keeps an empty string.

    Scale shape: line text is fingerprinted in the scan projection;
    the (group, fingerprint, doc) frame deduplicates and counts with
    map-side partial aggregation (a viral template line never lands
    on one straggler — no per-fingerprint window), and the decision
    comes back as a LEFT ANTI join against only the boilerplate
    fingerprints — a frame with one row per distinct template line
    per group, orders smaller than the corpus, which AQE broadcasts
    when it fits. The rebuild shuffles surviving line text once on
    the doc id, the unavoidable reconstruction cost.
    """
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    if min_doc_frac is not None and not (0.0 < min_doc_frac <= 1.0):
        raise ValueError("min_doc_frac must be in (0, 1]")
    carry = [group_col] if group_col else []
    lines = explode_chunks(df, text_col, id_col, sep=sep, carry=carry).withColumn(
        "__fp", F.sha2(F.col("chunk"), 256)
    )
    key = [*carry, "__fp"]
    # distinct docs per line: pre-dedup (key, doc) so the count is a
    # plain aggregate with map-side combine, never count(DISTINCT)
    per_doc = lines.select(*key, id_col).distinct()
    freq = per_doc.groupBy(*key).agg(F.count(F.lit(1)).alias("__ndocs"))
    boiler = freq.filter(F.col("__ndocs") >= min_docs)
    if min_doc_frac is not None:
        totals_key = carry or []
        base = df.filter(F.col(text_col).isNotNull())
        if totals_key:
            totals = base.groupBy(*totals_key).agg(
                F.count(F.lit(1)).alias("__gdocs")
            )
            boiler = boiler.join(totals, totals_key)
        else:
            totals = base.agg(F.count(F.lit(1)).alias("__gdocs"))
            boiler = boiler.crossJoin(F.broadcast(totals))
        boiler = boiler.filter(
            F.col("__ndocs") >= F.col("__gdocs") * F.lit(min_doc_frac)
        )
    survivors = lines.join(boiler.select(*key), key, "left_anti")
    rebuilt = survivors.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            sep,
        ).alias(text_col)
    )
    all_docs = lines.select(id_col).distinct()
    return all_docs.join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
