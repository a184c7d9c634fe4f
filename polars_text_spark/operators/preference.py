"""Preference-pair (DPO/RLHF) training-data audit (beyond-reference:
post-training data curation, the sibling of the SFT chat lint in
``operators/chat.py``).

Preference optimization consumes ``(prompt, chosen, rejected)``
triples; the rows that silently poison a DPO run are exactly the ones
no schema check catches: pairs whose two sides are IDENTICAL (zero
gradient), pairs with an empty side, the same completion appearing as
``chosen`` in one pair and ``rejected`` in another (label noise — the
optimizer is told to both raise and lower its likelihood), heavily
duplicated prompts (effective epoch count on one prompt), and the
length skew that lets a reward model learn "longer is better" instead
of the preference signal.

Scale shape: every per-pair signal is a map-only expression; the two
corpus-level signals cost one groupBy on the prompt hash (map-side
combined, |distinct prompts| rows) and one hash-keyed left join of the
chosen side against the DISTINCT rejected-hash frame — corpus-sized,
deliberately NOT broadcast. Text never enters a grouping key: both
joins key on ``sha2`` digests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.operators._cols import require_free_columns

__all__ = ["preference_pair_audit"]


def _ws_count(col):
    return F.size(
        F.filter(
            F.split(F.trim(col), r"\s+"), lambda t: t != F.lit("")
        )
    ).cast("long")


def preference_pair_audit(
    pairs: DataFrame,
    *,
    id_col: str = "pair_id",
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """Audit a preference-pair frame: returns one row per input pair
    with ``(id_col, identical_pair, empty_side, len_chosen,
    len_rejected, len_log_ratio, prompt_pair_count,
    chosen_contradicted, valid)``.

    - ``identical_pair``: chosen == rejected byte-for-byte (no
      training signal);
    - ``empty_side``: either side null or whitespace-only;
    - ``len_*``: whitespace token counts; ``len_log_ratio`` =
      ``log2((len_chosen+1)/(len_rejected+1))`` — the length-bias
      diagnostic to histogram before training a reward model;
    - ``prompt_pair_count``: how many pairs share this row's prompt
      (exact duplicates by content; NULL prompts count as their own
      group, distinct from empty-string prompts);
    - ``chosen_contradicted``: this pair's chosen text appears as
      some pair's REJECTED text anywhere in the corpus (label
      noise; an identical_pair trivially contradicts itself, which
      is why that flag exists separately);
    - ``valid``: no identical pair, no empty side, not contradicted.

    Row multiplicity is preserved; ``id_col`` passes through
    untouched.
    """
    require_free_columns(
        pairs,
        ("__pp_ph", "__pp_ch", "__pp_rh", "__pp_cnt", "__pp_contra"),
        "preference_pair_audit",
    )
    c, r, p = F.col(chosen_col), F.col(rejected_col), F.col(prompt_col)

    # presence-prefixed digest: NULL hashes as "n:" and a value as
    # sha2("s:" || value), so a NULL prompt and an empty-string prompt
    # land in DIFFERENT prompt_pair_count groups (concat propagates
    # null, coalesce catches it) — conflating them would silently
    # merge two distinct duplication diagnostics
    def _h(col):
        return F.coalesce(
            F.sha2(F.concat(F.lit("s:"), col), 256), F.lit("n:")
        )

    d = pairs.select(
        F.col(id_col),
        p.alias("__pp_p"),
        c.alias("__pp_c"),
        r.alias("__pp_r"),
        _h(p).alias("__pp_ph"),
        _h(c).alias("__pp_ch"),
        _h(r).alias("__pp_rh"),
    )
    prompt_counts = d.groupBy("__pp_ph").agg(
        F.count(F.lit(1)).alias("__pp_cnt")
    )
    rejected_hashes = (
        d.filter(
            F.col("__pp_r").isNotNull() & (F.trim("__pp_r") != F.lit(""))
        )
        .select(F.col("__pp_rh").alias("__pp_contra"))
        .distinct()
    )
    out = (
        d.join(prompt_counts, "__pp_ph")
        .join(
            rejected_hashes,
            d["__pp_ch"] == rejected_hashes["__pp_contra"],
            "left",
        )
    )
    identical = F.coalesce(F.col("__pp_c") == F.col("__pp_r"), F.lit(False))
    empty = (
        F.col("__pp_c").isNull()
        | F.col("__pp_r").isNull()
        | (F.trim("__pp_c") == F.lit(""))
        | (F.trim("__pp_r") == F.lit(""))
    )
    contradicted = F.col("__pp_contra").isNotNull() & ~empty
    return out.select(
        id_col,
        identical.alias("identical_pair"),
        empty.alias("empty_side"),
        F.coalesce(_ws_count(F.col("__pp_c")), F.lit(0)).alias("len_chosen"),
        F.coalesce(_ws_count(F.col("__pp_r")), F.lit(0)).alias(
            "len_rejected"
        ),
        F.log2(
            (F.coalesce(_ws_count(F.col("__pp_c")), F.lit(0)) + 1).cast(
                "double"
            )
            / (F.coalesce(_ws_count(F.col("__pp_r")), F.lit(0)) + 1)
        ).alias("len_log_ratio"),
        F.col("__pp_cnt").cast("long").alias("prompt_pair_count"),
        contradicted.alias("chosen_contradicted"),
        (~identical & ~empty & ~contradicted).alias("valid"),
    )
