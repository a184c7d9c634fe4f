"""Golden tests for the scalar ops — values from the reference's
tests/test_polars_text_utils.py and FIXTURES.md F1."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.functions import (
    char_count,
    clean_text,
    sentence_count,
    word_count,
)

ROWS = [
    (1, "Hello, World! 123"),
    (2, "  one   two  "),
    (3, "single"),
    (4, ""),
    (5, None),
    (6, "One. Two? Three!"),
    (7, "今天天气很好"),
    (8, "안녕하세요"),
    (9, "今天天气很好。明天也会很好！你想去哪里？"),
    (10, "Hello. 你好。"),
    (11, "Hello 你好"),
    (12, "hi 🙂 there 👋 friend"),
]


def _run(spark, col_fn):
    df = spark.createDataFrame(ROWS, ["id", "text"])
    rows = df.select("id", col_fn("text").alias("v")).orderBy("id").collect()
    return {r.id: r.v for r in rows}


def test_clean_text(spark):
    got = _run(spark, clean_text)
    assert got[1] == "hello world"
    assert got[2] == "one two"
    assert got[3] == "single"
    assert got[4] == ""
    assert got[5] == ""
    assert got[6] == "one two three"
    assert got[7] == "今天天气很好"  # non-ASCII untouched
    assert got[10] == "hello 你好。"  # CJK fullwidth punct untouched


def test_word_count(spark):
    got = _run(spark, word_count)
    assert got[1] == 3
    assert got[2] == 2
    assert got[3] == 1
    assert got[4] == 0
    assert got[5] == 0
    assert got[7] == 6  # pure CJK: per-char
    assert got[8] == 5  # Hangul
    assert got[11] == 2  # whitespace split wins for mixed
    assert got[12] == 5


def test_char_count(spark):
    got = _run(spark, char_count)
    assert got[1] == 17
    assert got[4] == 0
    assert got[5] == 0
    assert got[7] == 6
    assert got[12] == len("hi 🙂 there 👋 friend")  # code points, not UTF-16 units


def test_sentence_count(spark):
    got = _run(spark, sentence_count)
    assert got[1] == 2  # "Hello, World" | " 123"
    assert got[4] == 0
    assert got[5] == 0
    assert got[6] == 3
    assert got[9] == 3  # CJK terminators
    assert got[10] == 2  # mixed terminators


def test_reference_goldens_exact(spark):
    """The reference's own golden values, verbatim
    (tests/test_polars_text_utils.py)."""
    rows = [
        (1, "今天 nice 天气"),  # mixed CJK + ws -> whitespace split
        (2, "ご飯"),  # Hiragana -> per-char
        (3, "你好"),
        (4, "ご飯を食べました。映画を見ますか？"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    wc = {r.id: r.v for r in df.select("id", word_count("text").alias("v")).collect()}
    assert wc[1] == 3 and wc[2] == 2 and wc[3] == 2
    sc = {r.id: r.v for r in df.select("id", sentence_count("text").alias("v")).collect()}
    assert sc[4] == 2


def test_scalar_ops_are_codegen_friendly(spark, sf_dir):
    """No UDFs in the plan: these must stay JVM-side built-ins."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        clean_text("text"), word_count("text"), char_count("text"), sentence_count("text")
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # No JVM<->Python boundary anywhere in the plan; a single projection
    # over the scan. (The higher-order filter() lambda keeps the Project
    # out of whole-stage codegen, but it is still JVM-side columnar.)
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan
    assert "Scan parquet" in plan


def test_sentence_segments_hand_cases(spark):
    from polars_text_spark.functions.scalar import sentence_segments

    rows = [
        ("Hi!! Bye. ok",),
        ("a.b",),
        (" . .",),          # terminator-only pieces are content-free
        ("abc",),           # trailing unterminated sentence kept
        ("",),
        (None,),
        ("第一句。第二句！tail",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = [r["s"] for r in df.select(sentence_segments("text").alias("s")).collect()]
    assert got == [
        ["Hi!!", "Bye.", "ok"],
        ["a.", "b"],
        [],
        ["abc"],
        [],
        [],
        ["第一句。", "第二句！", "tail"],
    ]


def test_sentence_segments_size_equals_sentence_count(spark, sf_dir):
    """The documented invariant: segmentation and the reference's
    counting op agree on every real document."""
    from polars_text_spark.functions.scalar import (
        sentence_count,
        sentence_segments,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.select(
        F.size(sentence_segments("text")).cast("long").alias("a"),
        sentence_count("text").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    assert bad.count() == 0


def test_sentence_segments_unicode_whitespace(spark):
    """NBSP / ideographic-space pieces are content-free: the filter
    uses the full Unicode White_Space set (explicit code points so
    the RE2 oracle reads the identical class), keeping the count
    invariant on real web text. Strings are chr()-built — no
    invisible literals in source."""
    from polars_text_spark.functions.scalar import (
        sentence_count,
        sentence_segments,
    )

    nbsp, ideo, lsep = chr(0xA0), chr(0x3000), chr(0x2028)
    rows = [
        ("Hello." + nbsp,),          # NBSP-only tail piece -> dropped
        ("A." + ideo + lsep + "B",), # exotic WS between sentences
        (nbsp + ideo + lsep,),       # whitespace-only doc -> empty
    ]
    df = spark.createDataFrame(rows, ["text"])
    out = df.select(
        sentence_segments("text").alias("s"), sentence_count("text").alias("n")
    ).collect()
    for r in out:
        assert len(r.s) == r.n, (r.s, r.n)
    assert out[0].s == ["Hello."]
    assert len(out[1].s) == 2
    assert out[2].s == []
