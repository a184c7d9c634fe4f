"""SQL surface: call the text ops from ``spark.sql``.

The reference is expression-plugin-only; exposing the same operators
as SQL functions is the optional-but-natural Spark extension
(SURVEY.md §4.1). Two mechanisms:

- the scalar ops register as **SQL scalar functions** (``CREATE
  FUNCTION ... RETURNS ... RETURN <expr>``) — pure Catalyst
  expressions, zero UDF overhead, fully optimizable (pushdown and
  codegen apply exactly as in the Column API);
- tokenize/concordance-class ops need Python, so they register as
  pandas UDFs via ``spark.udf.register`` with fixed default knobs
  (SQL functions can't take Python kwargs).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["register_sql_functions"]

# Expression bodies mirror functions/scalar.py (same Java regexes).
_SQL_SCALAR_FUNCTIONS = {
    "pt_clean_text": r"""
        (s STRING) RETURNS STRING RETURN
        coalesce(trim(regexp_replace(regexp_replace(lower(s),
            '[!-/:-@\\[-`{-~0-9]', ' '), '\\p{IsWhite_Space}+', ' ')), '')
    """,
    "pt_char_count": r"""
        (s STRING) RETURNS BIGINT RETURN coalesce(length(s), 0)
    """,
    "pt_word_count": r"""
        (s STRING) RETURNS BIGINT RETURN
        CASE
          WHEN s IS NULL THEN 0
          WHEN regexp_replace(s, '^\\p{IsWhite_Space}+|\\p{IsWhite_Space}+$', '') = '' THEN 0
          WHEN regexp_replace(s, '^\\p{IsWhite_Space}+|\\p{IsWhite_Space}+$', '')
               RLIKE '\\p{IsWhite_Space}'
            THEN size(split(regexp_replace(s, '^\\p{IsWhite_Space}+|\\p{IsWhite_Space}+$', ''),
                            '\\p{IsWhite_Space}+'))
          WHEN regexp_replace(s, '^\\p{IsWhite_Space}+|\\p{IsWhite_Space}+$', '')
               RLIKE '^[一-鿿㐀-䶿\\x{20000}-\\x{2A6DF}぀-ゟ゠-ヿ가-힯]+$'
            THEN length(regexp_replace(s, '^\\p{IsWhite_Space}+|\\p{IsWhite_Space}+$', ''))
          ELSE 1
        END
    """,
    "pt_sentence_count": r"""
        (s STRING) RETURNS BIGINT RETURN
        coalesce(size(filter(split(s, '[.!?。！？۔؟।॥]'),
                             seg -> seg RLIKE '[^\\p{IsWhite_Space}]')), 0)
    """,
    # vowel-group syllable heuristic (functions/analysis.py::readability)
    "pt_syllables": r"""
        (s STRING) RETURNS BIGINT RETURN
        CASE WHEN s IS NULL THEN NULL ELSE
          aggregate(filter(split(lower(trim(s)), '\\s+'), t -> t != ''),
                    CAST(0 AS BIGINT),
                    (acc, w) -> acc + CAST(greatest(1,
                        size(split(w, '[aeiouy]+')) - 1) AS BIGINT))
        END
    """,
    "pt_flesch": r"""
        (s STRING) RETURNS DOUBLE RETURN
        CASE WHEN s IS NULL
               OR size(filter(split(lower(trim(s)), '\\s+'), t -> t != '')) = 0
               OR pt_sentence_count(s) = 0
             THEN NULL
             ELSE 206.835
               - 1.015 * (CAST(size(filter(split(lower(trim(s)), '\\s+'),
                                           t -> t != '')) AS DOUBLE)
                          / pt_sentence_count(s))
               - 84.6 * (CAST(pt_syllables(s) AS DOUBLE)
                         / size(filter(split(lower(trim(s)), '\\s+'),
                                       t -> t != '')))
        END
    """,
}


def register_sql_functions(
    spark: SparkSession, *, tokenizer_model: str = "native:plain_words_en"
) -> None:
    """Register ``pt_*`` functions for use from ``spark.sql``.

    Scalar ops become SQL scalar functions (temporary, session-scoped);
    ``pt_tokens(s)`` is the tokenizer pandas UDF with default knobs.
    """
    for name, body in _SQL_SCALAR_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")

    from polars_text_spark.functions.tokenize import TOKEN_SCHEMA, _tokenize_fn

    import pyspark.sql.functions as F

    spark.udf.register(
        "pt_tokens",
        F.pandas_udf(_tokenize_fn(tokenizer_model, True, True), TOKEN_SCHEMA),
    )

    from polars_text_spark.functions.analysis import _char_entropy_fn

    spark.udf.register(
        "pt_char_entropy", F.pandas_udf(_char_entropy_fn(), "double")
    )
