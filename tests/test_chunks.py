"""Unit tests for sub-document chunk deduplication stats."""

from __future__ import annotations

from polars_text_spark.operators.chunks import chunk_dup_stats, explode_chunks


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
