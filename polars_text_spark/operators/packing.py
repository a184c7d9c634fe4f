"""Training-sequence packing: map documents onto fixed-token-budget
training sequences (GPT-style concat-and-chop).

Pretraining consumes a corpus as one token stream chopped into
``budget``-token sequences; a doc whose stream span crosses a chop
boundary contributes to several sequences. This operator computes,
per document, WHERE in that stream it lands — entirely with window
aggregations (no UDF, no driver state):

- ``stream_start``  — tokens before this doc within its shard;
- ``first_seq`` / ``last_seq`` — sequence ids the doc touches
  (shard-local);
- ``n_seqs``        — how many sequences it spans;
- ``seq_offset``    — offset of the doc's first token inside
  ``first_seq``.

Scale design: a single global ordered window is ONE task no matter
the cluster size — so packing is per-``shard_col`` (lang, source, a
hash bucket: anything that partitions the stream the way the training
job shards its data files). Each shard's window runs independently
after one shuffle on the shard key. ``shard_col=None`` packs the
whole frame as one stream — correct, but a deliberate single-task
path for tests and small corpora only.

Determinism: ``order_col`` must be a total order within each shard
(a unique id); ties would make ``stream_start`` depend on shuffle
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fim_transform", "pack_sequences", "sequence_manifest"]


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    budget: int,
    *,
    order_col: str,
    shard_col: str | None = None,
) -> DataFrame:
    """Append stream/sequence placement columns (see module doc).

    Zero-token docs occupy no stream span: they are assigned to the
    sequence at their stream position with ``n_seqs = 0``.
    """
    if budget <= 0:
        raise ValueError("budget must be a positive token count")
    w = (
        Window.partitionBy(shard_col) if shard_col else Window.partitionBy()
    ).orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    tok = F.col(token_count_col).cast("long")
    # Materialize the running sum ONCE (a second select keeps the
    # Window node to a single expression instead of one copy per
    # derived column), then derive placement with integer math.
    with_start = df.select(
        *df.columns,
        F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
        .cast("long")
        .alias("stream_start"),
    )
    start = F.col("stream_start")
    first_seq = F.floor(start / budget)
    # Last stream position occupied is start + tok - 1 (empty docs
    # span nothing — guarded below).
    last_seq = F.floor((start + tok - F.lit(1)) / budget)
    return with_start.select(
        *df.columns,
        "stream_start",
        first_seq.alias("first_seq"),
        F.when(tok <= 0, first_seq).otherwise(last_seq).alias("last_seq"),
        F.when(tok <= 0, F.lit(0).cast("long"))
        .otherwise(last_seq - first_seq + 1)
        .alias("n_seqs"),
        (start % budget).alias("seq_offset"),
    )


def sequence_manifest(
    packed: DataFrame,
    token_count_col: str,
    budget: int,
    *,
    id_cols: tuple[str, ...] = ("doc_id",),
    shard_col: str | None = None,
) -> DataFrame:
    """Explode :func:`pack_sequences` output into the per-sequence
    slice list a training job consumes: one row per (sequence, doc
    slice). ``seq_id`` is SHARD-LOCAL (pack_sequences numbers each
    shard's stream independently), so the manifest's grouping key is
    ``(shard_col, seq_id)`` when the packing was sharded — pass the
    same ``shard_col`` you packed with and ``groupBy(shard_col,
    "seq_id")`` yields exactly the docs (and token ranges) to
    concatenate for each sequence. Without a shard the key is plain
    ``seq_id``.

    Columns: ``shard_col`` (if any) + ``id_cols`` + ``seq_id`` +
    ``seq_pos`` (where the slice starts inside the sequence),
    ``doc_tok_start`` (where it starts inside the doc), ``slice_len``.
    Zero-token docs emit no rows.

    The explode fan-out is ``n_seqs`` per doc — bounded by
    ``tok/budget + 1``, so the manifest is ~``corpus_tokens/budget``
    rows regardless of doc-length skew: a book spanning 10k sequences
    becomes 10k cheap integer rows, not a hot key.
    """
    if budget <= 0:
        raise ValueError("budget must be a positive token count")
    out_cols = tuple(id_cols)
    if shard_col is not None and shard_col not in out_cols:
        out_cols = (shard_col, *out_cols)
    tok = F.col(token_count_col).cast("long")
    seq = F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias(
        "seq_id"
    )
    rows = packed.filter(tok > 0).select(*out_cols, "stream_start", tok.alias("__tok"), seq)
    s = F.col("seq_id")
    seq_lo = s * budget
    slice_start_stream = F.greatest(F.col("stream_start"), seq_lo)
    slice_end_stream = F.least(
        F.col("stream_start") + F.col("__tok"), seq_lo + budget
    )
    return rows.select(
        *out_cols,
        "seq_id",
        (slice_start_stream - seq_lo).alias("seq_pos"),
        (slice_start_stream - F.col("stream_start")).alias("doc_tok_start"),
        (slice_end_stream - slice_start_stream).alias("slice_len"),
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    *,
    prefix_token: str = "<PRE>",
    suffix_token: str = "<SUF>",
    middle_token: str = "<MID>",
    fim_rate: float = 0.5,
    salt: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022, the
    standard code/LM infilling augmentation): for a deterministic
    ``fim_rate`` fraction of documents, pick two sha-uniform split
    points i <= j over the character span and emit PSM order —
    ``<PRE>prefix<SUF>suffix<MID>middle`` — so the model learns to
    infill; the rest pass through unchanged. Adds ``fim_text`` and
    ``fim_applied`` columns.

    Everything is derived from ``sha256(key || salt)`` uniforms
    (:func:`polars_text_spark.operators.sampling.key_uniform`), so the
    transform is map-only (fused into the scan, no shuffle, no UDF),
    rerun-stable, and engine-replayable — an oracle recomputes the
    split points and must reproduce every transformed character.
    """
    from polars_text_spark.operators.sampling import key_uniform

    c = F.col(text_col)
    key = F.col(key_col)
    length = F.length(c)
    u1 = key_uniform(key, salt + "1")
    u2 = key_uniform(key, salt + "2")
    i = F.floor(F.least(u1, u2) * length).cast("int")
    j = F.floor(F.greatest(u1, u2) * length).cast("int")
    # substring is 1-based: prefix=[1,i], middle=(i,j], suffix=(j,end]
    prefix = F.substring(c, 1, i)
    middle = F.substring(c, i + 1, j - i)
    suffix = c.substr(j + 1, length - j)
    applied = c.isNotNull() & (
        key_uniform(key, salt + "r") < F.lit(float(fim_rate))
    )
    fim = F.concat(
        F.lit(prefix_token), prefix,
        F.lit(suffix_token), suffix,
        F.lit(middle_token), middle,
    )
    return df.withColumn("fim_applied", applied).withColumn(
        "fim_text", F.when(applied, fim).otherwise(c)
    )
