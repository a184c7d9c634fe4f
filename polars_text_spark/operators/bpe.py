"""Distributed BPE merge learning — tokenizer TRAINING as a corpus
operator, the missing upstream of every `tokenize(model=...)` call:
at 100 TB the tokenizer itself is fit on the corpus, and the fit is a
textbook map-reduce (pair counting) + driver-side argmax loop
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units").

Scale design:

- **The corpus is touched ONCE** — `bpe_learn` aggregates whitespace
  tokens into a (word, cnt) TYPE frame up front; every merge round
  then runs over word TYPES (vocabulary-sized, orders below corpus
  size — the same reduction every real BPE trainer makes).
- **Per round**: one map-only pair projection + one
  ``groupBy(a, b).sum`` (map-side partial combine) + a global top-1
  via ``orderBy().limit(1)`` — Spark plans that as
  TakeOrderedAndProject (per-partition top-1, then a 1-row-per-
  partition reduce), never a full sort. The single collected row is
  the driver-side argmax every BPE trainer has; the merge itself
  re-applies as a map-only literal ``replace``.
- **Merge application without positional loops**: symbols live in a
  DOUBLE-SPACE-joined string (`` h  e  l  l  o ``). Replacing the
  literal `` a  b `` with `` ab `` consumes one space from each
  flanking double separator, so consecutive occurrences stay
  matchable and left-to-right replace-all reproduces exactly the
  greedy leftmost merge order BPE specifies — in ANY engine's literal
  ``replace``, which is what makes the merge sequence
  oracle-replayable (no regex, no backrefs, no lookaround).
- ``localCheckpoint`` per round truncates the growing replace
  lineage, the same discipline as components.py / graph.py.
- Upgrade path, documented not built: incremental pair-delta
  maintenance (only words containing the merged pair change counts)
  — the HF-trainer trick — trades the per-round recount for state;
  the recount is one embarrassingly-parallel pass over the type
  frame and is the right default until profiles say otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_learn", "bpe_segment"]


def _symbolize(word: Column) -> Column:
    """`` h  e  l  l  o ``-style double-space symbol string of a word
    (leading/trailing single space so every symbol is ``' x '``-
    addressable)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def _sym_array(symstr: Column) -> Column:
    return F.split(F.trim(symstr), "  ")


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 5,
    min_freq: int = 2,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a corpus; returns the
    ranked merge table ``(merge_rank, left_sym, right_sym, merged,
    freq)`` — deterministic: the argmax tie-break is (freq desc,
    left asc, right asc), and pair counting is exact integer
    aggregation. Stops early when the best remaining pair's frequency
    drops below ``min_freq``. ``freq`` is the pair's corpus frequency
    AT SELECTION TIME (i.e. after the previous merges applied),
    exactly as the classic trainer reports it.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    from polars_text_spark.functions.analysis import ws_token_array

    spark = df.sparkSession
    words = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(ws_token_array(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("w", "cnt", _symbolize(F.col("w")).alias("s"))
        .localCheckpoint(eager=True)
    )

    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, num_merges + 1):
        syms = _sym_array(F.col("s"))
        pairs = (
            words.filter(F.size(syms) >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(syms) - 1),
                        lambda i: F.struct(
                            F.element_at(syms, i).alias("a"),
                            F.element_at(syms, i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .select("cnt", "p.a", "p.b")
        )
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < min_freq:
            break
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["freq"])
        merges.append((r, a, b, a + b, freq))
        words = words.select(
            "w",
            "cnt",
            F.replace(
                F.col("s"), F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
            ).alias("s"),
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string,"
        " merged string, freq long",
    )


def bpe_segment(
    col: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """Segment a WORD column with a learned merge list (in rank
    order): ``array<string>`` of subword symbols. The apply path of
    :func:`bpe_learn` — each merge is one literal map-only
    ``replace`` over the double-space symbol string, so the plan is a
    chain of ``num_merges`` string ops fused into the scan. Fine for
    the few-hundred-merge vocabularies this demo-scale trainer
    produces; a production-sized merge table (30k+) belongs in a
    pandas UDF carrying a real tokenizer, which is exactly the gated
    ``huggingface:*`` backend in functions/tokenize.py."""
    c = F.col(col) if isinstance(col, str) else col
    s = _symbolize(c)
    for a, b in merges:
        s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return _sym_array(s).alias("bpe_segments")
