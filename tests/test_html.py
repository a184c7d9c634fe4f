"""HTML -> text extraction (functions/html.py) — the pass upstream of
the web-curation battery. Hand cases pin the contract (whole-container
drops, block-vs-inline tag handling, single-decode entity order,
whitespace normalization); the plan test pins map-only execution."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.functions.html import (
    extract_html_text,
    html_hrefs,
)
from polars_text_spark.plans import explain_str


def _extract(spark, html_strings):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(html_strings)], "i int, h string"
    )
    rows = df.select("i", extract_html_text("h")).collect()
    return [r.extracted_text for r in sorted(rows, key=lambda r: r.i)]


def test_basic_page(spark):
    (out,) = _extract(
        spark,
        [
            "<html><head><title>T</title><style>p{color:red}</style></head>"
            "<body><h1>Head</h1><!-- note --><p>Hello <b>world</b>.</p>"
            "<script>var x='<p>gotcha';</script></body></html>"
        ],
    )
    # style/script/comment payloads gone ENTIRELY (including the fake
    # tag inside the script string); block tags break lines (the
    # </h1><p> boundary yields a paragraph-separating blank line); the
    # inline <b> separates but does not break.
    assert out == "T\nHead\n\nHello world ."
    assert "gotcha" not in out and "color" not in out and "note" not in out


def test_inline_tags_become_spaces_not_welds(spark):
    (out,) = _extract(spark, ["a<b>b</b>c<i>d</i>"])
    # "a b c d" not "abcd": inline markup must not weld words.
    assert out == "a b c d"


def test_entity_single_decode_order(spark):
    (out,) = _extract(
        spark, ["a&amp;b &lt;tag&gt; &amp;lt;escaped &quot;q&quot; &#39;s&#39; x&nbsp;y"]
    )
    # &amp;lt; is an ESCAPED escape: one decode yields the literal
    # "&lt;", never "<" (double-decode is the classic injection bug).
    assert out == 'a&b <tag> &lt;escaped "q" \'s\' x y'


def test_malformed_tag_and_plain_text(spark):
    got = _extract(spark, ["broken <div attr=\"x> text", "no markup", None, ""])
    assert got == ["broken\ntext", "no markup", None, ""]


def test_whitespace_normalization(spark):
    (out,) = _extract(
        spark, ["  a\t\tb\r\nc <br/> d\n\n\n\n\ne   \n   f  "]
    )
    assert out == "a b\nc\nd\n\ne\nf"


def test_hrefs_in_document_order_case_insensitive(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                '<a href="https://x.org/1">one</a>'
                "<A HREF=\"/rel\">two</A><a data-href=\"skip\">n</a>"
                '<link href="style.css">',
            ),
            (2, "no links"),
            (3, None),
        ],
        "i int, h string",
    )
    rows = {r.i: r.hrefs for r in df.select("i", html_hrefs("h")).collect()}
    assert rows[1] == ["https://x.org/1", "/rel", "style.css"]
    assert rows[2] == []
    assert rows[3] is None


def test_extraction_is_map_only(spark):
    df = spark.range(10).select(
        F.concat(F.lit("<p>doc "), F.col("id").cast("string"), F.lit("</p>"))
        .alias("h")
    )
    plan = explain_str(
        df.select(extract_html_text("h"), html_hrefs("h")), "formatted"
    )
    assert "Exchange" not in plan


def test_html_anchors_alignment_and_cleanup(spark):
    from polars_text_spark.functions.html import html_anchors

    df = spark.createDataFrame(
        [
            (
                1,
                '<a href="https://a.org"><b>Bold &amp; nested</b></a>'
                ' text <a class="c" href="/rel">plain</a>'
                '<a name="no-href-anchor">skip</a>',
            ),
            (2, "no links"),
        ],
        "i int, h string",
    )
    ex = df.select("i", F.explode(html_anchors("h")).alias("a")).select(
        "i",
        F.col("a.href").alias("href"),
        extract_html_text(F.col("a.anchor_html")).alias("txt"),
    )
    rows = [(r.i, r.href, r.txt) for r in ex.collect()]
    assert rows == [
        (1, "https://a.org", "Bold & nested"),
        (1, "/rel", "plain"),
    ]
