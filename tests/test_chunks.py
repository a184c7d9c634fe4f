"""Unit tests for sub-document chunk deduplication stats and the
boilerplate-strip rebuild."""

from __future__ import annotations

import pytest

from polars_text_spark.operators.chunks import (
    chunk_dup_stats,
    explode_chunks,
    strip_duplicate_chunks,
)


def _df(spark):
    rows = [
        # "boiler" appears in docs 1, 2 and twice in 3
        (1, "boiler\n\nunique one"),
        (2, "boiler\n\nunique two\n\n  "),
        (3, "boiler\n\nboiler"),
        (4, "all original here"),
        (5, None),
        (6, "   \n\n   "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_explode_chunks_trims_and_drops_blanks(spark):
    got = explode_chunks(_df(spark)).collect()
    by_doc: dict[int, list[tuple[int, str]]] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
    assert sorted(by_doc[2]) == [(0, "boiler"), (1, "unique two")]  # blank dropped
    assert sorted(by_doc[3]) == [(0, "boiler"), (1, "boiler")]
    assert 5 not in by_doc  # NULL text: no rows
    assert 6 not in by_doc  # all-blank: no rows


def test_chunk_dup_stats(spark):
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_chunk_frac"])
        for r in chunk_dup_stats(_df(spark)).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (2, 2, 1.0)  # within-doc repeats count too
    assert got[4] == (1, 0, 0.0)
    assert 5 not in got and 6 not in got


def test_strip_duplicate_chunks_keep_first(spark):
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_chunks(_df(spark)).collect()
    }
    # doc 1 holds the globally-first "boiler"; later copies vanish
    assert got[1] == "boiler\n\nunique one"
    assert got[2] == "unique two"
    assert got[3] == ""  # both chunks were later copies -> empty doc
    assert got[4] == "all original here"
    assert 5 not in got and 6 not in got  # no chunks, no row


def test_strip_duplicate_chunks_no_keep_first(spark):
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_chunks(
            _df(spark), keep_first=False
        ).collect()
    }
    # every repeated chunk disappears everywhere
    assert got[1] == "unique one"
    assert got[2] == "unique two"
    assert got[3] == ""


def test_regex_metachar_separator_is_literal(spark):
    """sep is a literal string, not a regex: '|' must split on pipes,
    not on every character, and the strip round-trip must rebuild
    with the same literal separator."""
    df = spark.createDataFrame(
        [(1, "alpha|beta"), (2, "gamma|beta")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["chunk"]
        for r in explode_chunks(df, sep="|").filter("chunk_idx = 0").collect()
    }
    assert got == {1: "alpha", 2: "gamma"}
    stripped = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_chunks(df, sep="|").collect()
    }
    # "beta" repeats corpus-wide; doc 1 keeps the first copy
    assert stripped == {1: "alpha|beta", 2: "gamma"}


def test_strip_duplicate_chunks_max_occurrences(spark):
    # "boiler" occurs 4x corpus-wide; allowing up to 4 keeps everything
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_chunks(
            _df(spark), max_occurrences=4
        ).collect()
    }
    assert got[3] == "boiler\n\nboiler"
    with pytest.raises(ValueError, match="max_occurrences"):
        strip_duplicate_chunks(_df(spark), max_occurrences=0)


def _tmpl_df(spark):
    from pyspark.sql import functions as F  # noqa: F401

    return spark.createDataFrame(
        [
            (1, "a", "Home | About\ncontent one\nCopyright 2026"),
            (2, "a", "Home | About\ncontent two\nCopyright 2026"),
            (3, "a", "unique page\ncontent three"),
            (4, "b", "Home | About\nother domain content"),
            (5, "b", "rep\nrep\nrep"),
            (6, "a", None),
            (7, "a", "Home | About\nCopyright 2026"),
        ],
        "doc_id long, src string, text string",
    )


def test_strip_common_lines_group_scoped(spark):
    from polars_text_spark.operators.chunks import strip_common_lines

    got = {
        r.doc_id: r.text
        for r in strip_common_lines(
            _tmpl_df(spark), "text", "doc_id", "src", min_docs=2
        ).collect()
    }
    # template lines stripped within group 'a' (3 and 2 of its 4 docs)
    assert got[1] == "content one"
    assert got[2] == "content two"
    assert got[3] == "unique page\ncontent three"
    # same line in group 'b' appears in only ONE doc there -> survives
    assert got[4] == "Home | About\nother domain content"
    # in-doc repetition is not boilerplate (distinct-doc counting)
    assert got[5] == "rep\nrep\nrep"
    # null text yields no row; fully-templated doc keeps empty string
    assert 6 not in got and got[7] == ""


def test_strip_common_lines_corpus_wide_and_frac(spark):
    from polars_text_spark.operators.chunks import strip_common_lines

    got = {
        r.doc_id: r.text
        for r in strip_common_lines(
            _tmpl_df(spark), "text", "doc_id", None, min_docs=2
        ).collect()
    }
    # corpus-wide: the 'b'-group copy is stripped too
    assert got[4] == "other domain content"
    # frac gate: 'Home | About' is in 3/4 of group-a docs < 0.9 -> kept
    kept = {
        r.doc_id: r.text
        for r in strip_common_lines(
            _tmpl_df(spark),
            "text",
            "doc_id",
            "src",
            min_docs=2,
            min_doc_frac=0.9,
        ).collect()
    }
    assert kept[1] == "Home | About\ncontent one\nCopyright 2026"


def test_strip_common_lines_validates_params(spark):
    import pytest as _pytest

    from polars_text_spark.operators.chunks import strip_common_lines

    with _pytest.raises(ValueError, match="min_docs"):
        strip_common_lines(_tmpl_df(spark), min_docs=0)
    with _pytest.raises(ValueError, match="min_doc_frac"):
        strip_common_lines(_tmpl_df(spark), min_doc_frac=1.5)


def test_strip_common_lines_no_fingerprint_window(spark):
    """The boilerplate decision must be aggregate+anti-join — no
    window partitioned by the line fingerprint (hot-template straggler
    at scale)."""
    from polars_text_spark.operators.chunks import strip_common_lines
    from polars_text_spark.plans import explain_str

    plan = explain_str(
        strip_common_lines(_tmpl_df(spark), "text", "doc_id", "src"),
        "formatted",
    )
    assert "Window" not in plan
    assert "LeftAnti" in plan
