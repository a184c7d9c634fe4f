"""Golden tests for the text-analysis functions (language-ID, quality,
token counts, fingerprint) — the oracle queries cover them in
aggregate; these pin per-row behavior on crafted inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_text_spark.functions import (
    detect_language,
    doc_fingerprint,
    quality_score,
    token_count_bpe,
    token_count_ws,
)

ROWS = [
    (1, "the cat sat on the mat and it was happy"),  # en
    (2, "der Hund ist nicht mit der Katze"),  # de
    (3, "le chat est dans la maison pour dormir"),  # fr
    (4, "el perro es una mascota que vive por aqui"),  # es
    (5, "你好世界"),  # zh (CJK presence wins)
    (6, "xyzzy plugh frobnicate"),  # no stopwords -> unknown
    (7, None),
    (8, ""),
]


@pytest.fixture(scope="module")
def analyzed(spark):
    df = spark.createDataFrame(ROWS, ["id", "text"])
    return {
        r.id: r
        for r in df.select(
            "id",
            detect_language("text"),
            quality_score("text"),
            token_count_ws("text"),
            token_count_bpe("text"),
            doc_fingerprint("text"),
        ).collect()
    }


def test_detect_language(analyzed):
    expected = {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh", 6: "unknown", 7: "unknown"}
    for doc_id, lang in expected.items():
        assert analyzed[doc_id].lang_detected == lang, doc_id


def test_quality_score_bounds(analyzed):
    for doc_id, r in analyzed.items():
        assert 0.0 <= r.quality_score <= 1.0, doc_id
    assert analyzed[7].quality_score == 0.0  # null
    assert analyzed[8].quality_score == 0.0  # empty
    # natural prose with stopwords scores higher than gibberish
    assert analyzed[1].quality_score > analyzed[6].quality_score


def test_token_counts(analyzed):
    assert analyzed[1].token_count_ws == 10
    assert analyzed[1].token_count_bpe == 10  # pure word runs
    assert analyzed[7].token_count_ws == 0 and analyzed[8].token_count_ws == 0
    assert analyzed[5].token_count_ws == 1  # unsegmented CJK run


def test_token_count_bpe_runs(spark):
    df = spark.createDataFrame([(1, "abc123!? x")], ["id", "text"])
    got = df.select(token_count_bpe("text")).first()[0]
    # letter run + digit run + symbol run + letter run
    assert got == 4


def test_normalize_text_forms(spark):
    from polars_text_spark.functions import normalize_text

    composed = "café"  # é as one code point
    decomposed = "café"  # e + combining acute
    df = spark.createDataFrame([(1, decomposed), (2, None)], ["id", "text"])
    got = {r.id: r.normalized for r in df.select("id", normalize_text("text")).collect()}
    assert got[1] == composed
    assert got[2] is None
    with pytest.raises(ValueError):
        normalize_text("text", form="NFX")


def test_remove_stopwords_both_shapes(spark):
    from polars_text_spark.functions import remove_stopwords, tokenize

    df = spark.createDataFrame([(1, "the cat sat on a mat")], ["id", "text"])
    plain = df.select(
        remove_stopwords(F.split("text", " "), "en").alias("t")
    ).first()
    assert plain.t == ["cat", "sat", "on", "mat"]
    structs = df.select(
        remove_stopwords(
            tokenize("text", model="native:plain_words_en"), "en", field="token"
        ).alias("t")
    ).first()
    assert [x.token for x in structs.t] == ["cat", "sat", "on", "mat"]
    assert structs.t[0].start == 4  # offsets preserved


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "  hello   world  "), (3, "different")],
        ["id", "text"],
    )
    fps = {r.id: r.fingerprint for r in df.select("id", doc_fingerprint("text")).collect()}
    assert fps[1] == fps[2] != fps[3]  # fingerprint is over clean_text
    assert len(fps[1]) == 64  # sha2-256 hex


def test_compression_ratio_separates_boilerplate_from_noise(spark):
    """The redundancy gate: a template flood compresses far below a
    high-entropy string; exact sizes are pinned by replaying zlib
    driver-side (same library, same level -> byte-identical)."""
    import zlib

    from polars_text_spark.functions.analysis import compression_ratio

    repetitive = "menu home about contact " * 200
    import hashlib

    noisy = "".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(32)
    )  # 2048 chars of hash hex — incompressible beyond the hex alphabet
    rows = {
        r.i: r.c
        for r in spark.createDataFrame(
            [(1, repetitive), (2, noisy), (3, None), (4, "")],
            "i int, t string",
        ).select("i", compression_ratio("t").alias("c")).collect()
    }
    assert rows[1].ratio < 0.1 < rows[2].ratio
    assert rows[2].ratio > 0.5
    for i, text in ((1, repetitive), (2, noisy)):
        raw = text.encode("utf-8")
        assert rows[i].n_bytes == len(raw)
        assert rows[i].n_compressed == len(zlib.compress(raw, 6))
    assert rows[3].ratio is None and rows[3].n_bytes is None
    assert rows[4] == (0, 0, 0.0)


def test_license_signals_hand_cases(spark):
    from polars_text_spark.functions.analysis import license_signals

    df = spark.createDataFrame(
        [
            (1, "code under the MIT Licence and the Apache License 2.0"),
            (2, "released into the Public Domain (CC0)"),
            (3, "GNU Lesser General Public License; also AGPLv3"),
            (4, "Creative Commons CC BY-NC-SA terms"),
            (5, "Copyright 2021. all rights reserved."),
            # priority: copyleft beats everything else present
            (6, "MIT License text, All Rights Reserved, see GPL-3.0"),
            (7, "no markers here, CC0123 is a part number"),
            (8, None),
        ],
        "id int, text string",
    )
    rows = {
        r.id: r.s
        for r in df.select("id", license_signals("text").alias("s")).collect()
    }
    assert rows[1].n_permissive == 2 and rows[1].verdict == "permissive"
    assert rows[2].n_public_domain == 2  # "Public Domain" + "CC0"
    assert rows[2].verdict == "public_domain"
    assert rows[3].n_copyleft == 2 and rows[3].verdict == "copyleft"
    assert rows[4].n_creative_commons == 2  # prose + CC BY-NC-SA
    assert rows[4].verdict == "creative_commons"
    assert rows[5].n_rights_reserved == 1  # case-insensitive
    assert rows[5].verdict == "rights_reserved"
    assert rows[6].verdict == "copyleft"  # most restrictive wins
    # \bCC0\b must not fire inside CC0123
    assert rows[7].verdict == "none" and rows[7].n_public_domain == 0
    assert rows[8].verdict is None


def test_license_signals_map_only(spark, sf_dir):
    from polars_text_spark.functions.analysis import license_signals
    from polars_text_spark.plans import explain_str

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = explain_str(docs.select("doc_id", license_signals("text")))
    assert "Exchange" not in plan


def test_code_signals_hand_cases(spark):
    from polars_text_spark.functions.analysis import code_signals

    py_snip = (
        "Intro prose.\n```\ndef parse_args(argv):\n"
        "    return argv[1:]\n```\ntrailing prose"
    )
    prose = (
        "The quiet afternoon settled over the valley and nothing in"
        " the village stirred except the slow river."
    )
    df = spark.createDataFrame(
        [
            (1, py_snip),
            (2, prose),
            (3, "var x = {a: 1};\n\tconsole.log(myVal);"),
            (4, ""),
            (5, None),
        ],
        "id int, text string",
    )
    rows = {
        r.id: r.s
        for r in df.select("id", code_signals("text").alias("s")).collect()
    }
    # fenced python: fences paired, keyword + indented line + symbols
    assert rows[1].n_fences == 2
    assert rows[1].n_keywords >= 2  # def, return
    assert rows[1].n_indented == 1
    assert rows[1].score > 0.3
    # clean prose scores near zero, far below any code row
    assert rows[2].n_keywords == 0 and rows[2].n_symbols == 0
    assert rows[2].score < 0.05 < rows[3].score
    # JS-ish line: var keyword, camelCase identifier, tab indent
    assert rows[3].n_keywords >= 1
    assert rows[3].n_identifiers >= 1  # myVal
    assert rows[3].n_indented == 1
    # empty -> zeros, null -> null fields
    assert rows[4].n_chars == 0 and rows[4].score == 0.0
    assert rows[5].score is None


def test_code_signals_map_only(spark, sf_dir):
    from polars_text_spark.functions.analysis import code_signals
    from polars_text_spark.plans import explain_str

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = explain_str(docs.select("doc_id", code_signals("text")))
    assert "Exchange" not in plan
