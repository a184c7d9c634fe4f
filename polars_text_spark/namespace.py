"""Optional ``Column.text`` namespace — UX parity with the reference.

The reference exposes ``pl.col("text").text.tokenize(...)`` via
Polars' expression-namespace registry
(/root/reference/polars_text/namespace.py:10-11). PySpark has no
registry, so this is an explicit opt-in monkey-patch
(SURVEY.md §1.1: "a text functions module + optional Column
monkey-patch helper"); the plain functions module stays the idiomatic
path.

    from polars_text_spark.namespace import enable_column_namespace
    enable_column_namespace()
    df.select(F.col("text").text.clean_text(),
              F.col("text").text.tokenize(model="native:plain_words_en"))
"""

from __future__ import annotations

from pyspark.sql import Column

from polars_text_spark import functions as T

__all__ = ["TextNamespace", "enable_column_namespace"]


class TextNamespace:
    """Mirrors the reference's namespace method set
    (polars_text/namespace.py:15-110)."""

    def __init__(self, col: Column) -> None:
        self._col = col

    def clean_text(self) -> Column:
        return T.clean_text(self._col)

    def word_count(self) -> Column:
        return T.word_count(self._col)

    def char_count(self) -> Column:
        return T.char_count(self._col)

    def sentence_count(self) -> Column:
        return T.sentence_count(self._col)

    def tokenize(
        self,
        *,
        model: str,
        lowercase: bool = True,
        remove_punct: bool = True,
    ) -> Column:
        return T.tokenize(
            self._col, model=model, lowercase=lowercase, remove_punct=remove_punct
        )

    def concordance(
        self,
        search_word: str,
        *,
        num_left_tokens: int = 5,
        num_right_tokens: int = 5,
        regex: bool = False,
        case_sensitive: bool = False,
    ) -> Column:
        return T.concordance(
            self._col,
            search_word,
            num_left_tokens=num_left_tokens,
            num_right_tokens=num_right_tokens,
            regex=regex,
            case_sensitive=case_sensitive,
        )

    def embedding(
        self,
        *,
        embedder_model: str | None = None,
        batch_size: int | None = None,
        input: str = "string",
    ) -> Column:
        return T.embedding(
            self._col,
            embedder_model=embedder_model,
            batch_size=batch_size,
            input=input,
        )


def enable_column_namespace() -> None:
    """Install the ``.text`` property on ``pyspark.sql.Column``.

    Idempotent; explicit opt-in because patching a library class
    should never happen on import.
    """
    if getattr(Column, "text", None) is not None and isinstance(
        getattr(Column, "text"), property
    ):
        return
    Column.text = property(lambda self: TextNamespace(self))  # type: ignore[attr-defined]
