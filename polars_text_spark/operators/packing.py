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

__all__ = ["pack_sequences"]


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
    start = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("long")
    first_seq = F.floor(start / budget)
    # Last stream position occupied is start + tok - 1 (empty docs
    # span nothing — guarded below).
    last_seq = F.floor((start + tok - F.lit(1)) / budget)
    return df.select(
        *df.columns,
        start.alias("stream_start"),
        first_seq.alias("first_seq"),
        F.when(tok <= 0, first_seq).otherwise(last_seq).alias("last_seq"),
        F.when(tok <= 0, F.lit(0).cast("long"))
        .otherwise(last_seq - first_seq + 1)
        .alias("n_seqs"),
        (start % budget).alias("seq_offset"),
    )
