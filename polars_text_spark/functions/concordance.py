"""Concordance (KWIC) search as an Arrow-batched pandas UDF.

Replicates /root/reference/src/concordance.rs:58-150 +
src/expressions.rs:186-221:

- regex or literal (escaped) search; case-insensitive by default;
- for each match: N plain-word tokens of left/right context
  (space-joined), the matched text, char ``start_idx``/``end_idx``
  into the original text, and ``l1``/``r1`` nearest-neighbor tokens
  (``""`` when absent);
- context tokens come from the plain-words tokenizer with
  ``lowercase=False, remove_punct=False`` (src/concordance.rs:101-102);
- empty search word / null text / no match -> empty list (after
  ``explode_outer`` + ``struct.*`` an empty list surfaces as one
  all-null row, matching tests/test_concordance.py:53-75).

Python match offsets are already char offsets, so the reference's
byte->char sweep (src/concordance.rs:82-90) is a no-op here.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_text_spark.functions.tokenize import plain_word_records

__all__ = ["CONCORDANCE_SCHEMA", "concordance", "concordance_for_text", "explode_concordance"]

CONCORDANCE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("left_context", T.StringType(), False),
            T.StructField("matched_text", T.StringType(), False),
            T.StructField("right_context", T.StringType(), False),
            T.StructField("start_idx", T.LongType(), False),
            T.StructField("end_idx", T.LongType(), False),
            T.StructField("l1", T.StringType(), False),
            T.StructField("r1", T.StringType(), False),
        ]
    ),
    containsNull=False,
)


def concordance_for_text(
    text: str | None,
    matcher: re.Pattern,
    num_left_tokens: int,
    num_right_tokens: int,
) -> list[dict]:
    """All KWIC hits for one text (src/concordance.rs:58-150)."""
    if not text:
        return []
    out = []
    left_take = max(num_left_tokens, 0)
    right_take = max(num_right_tokens, 0)
    for m in matcher.finditer(text):
        left_tokens = [t for t, _, _ in plain_word_records(text[: m.start()], False)]
        right_tokens = [t for t, _, _ in plain_word_records(text[m.end() :], False)]
        left_slice = left_tokens[len(left_tokens) - left_take :] if left_take else []
        right_slice = right_tokens[:right_take] if right_take else []
        out.append(
            {
                "left_context": " ".join(left_slice),
                "matched_text": m.group(),
                "right_context": " ".join(right_slice),
                "start_idx": m.start(),
                "end_idx": m.end(),
                "l1": left_slice[-1] if left_slice else "",
                "r1": right_slice[0] if right_slice else "",
            }
        )
    return out


def concordance(
    col: Column | str,
    search_word: str,
    *,
    num_left_tokens: int = 5,
    num_right_tokens: int = 5,
    regex: bool = False,
    case_sensitive: bool = False,
) -> Column:
    """KWIC matches as ``array<struct<...7 fields>>`` per row."""
    pattern = search_word if regex else re.escape(search_word)
    flags = 0 if case_sensitive else re.IGNORECASE
    # Compile eagerly: invalid user regex fails at plan-build time, like
    # the reference's RegexBuilder error path (src/concordance.rs:69-72).
    empty_search = search_word == ""
    if not empty_search:
        re.compile(pattern, flags)

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        matcher = None if empty_search else re.compile(pattern, flags)
        for series in batches:
            if matcher is None:
                yield pd.Series([[] for _ in range(len(series))], index=series.index)
            else:
                yield series.map(
                    lambda text: concordance_for_text(
                        text, matcher, num_left_tokens, num_right_tokens
                    )
                )

    udf = F.pandas_udf(fn, CONCORDANCE_SCHEMA)
    c = F.col(col) if isinstance(col, str) else col
    return udf(c).alias("concordance")


def explode_concordance(df, conc_col: str = "concordance"):
    """The reference's documented ``list.explode() + struct.unnest()``
    consumption recipe (README.md:94-101): one row per match, all-null
    row for matchless texts."""
    exploded = df.withColumn("__match", F.explode_outer(F.col(conc_col))).drop(conc_col)
    return exploded.select(
        *[c for c in exploded.columns if c != "__match"], "__match.*"
    )
