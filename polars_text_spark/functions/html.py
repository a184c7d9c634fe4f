"""HTML -> text extraction (beyond-reference: the step UPSTREAM of
every web-corpus curation pass in this package).

A web training pipeline starts from raw crawled HTML; everything the
repo already ships (CCNet line stripping, Gopher filters, dedup,
language id) assumes extracted text. This module closes that gap with
a trafilatura-style *heuristic* extractor built entirely from
``regexp_replace``/``replace`` built-ins:

- map-only, fused into the parquet/WARC-derived scan (no shuffle, no
  UDF, streaming-safe by construction);
- engine-replayable: every pattern below is shared verbatim with the
  DuckDB oracle (Java regex and RE2 both support the inline ``(?is)``
  flags and lazy quantifiers used here; no backreferences or
  lookaround, which RE2 lacks — that constraint is why script and
  style get separate patterns instead of one ``</\\1>`` backref).

This is deliberately NOT a spec-complete HTML5 parser (malformed-tag
recovery, CDATA, conditional comments); it is the high-throughput
first pass that turns 100 TB of crawl HTML into text good enough for
the downstream quality battery to judge. Documents that need DOM
fidelity should be routed to a gated parser backend instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "ANCHOR_PATTERN",
    "BLOCK_TAG_PATTERN",
    "COMMENT_PATTERN",
    "ENTITY_REPLACEMENTS",
    "HREF_PATTERN",
    "OTHER_TAG_PATTERN",
    "SCRIPT_PATTERN",
    "STYLE_PATTERN",
    "extract_html_text",
    "html_anchors",
    "html_hrefs",
    "html_text_sql",
]

# Non-content containers are dropped WHOLE (tag + payload): their
# bodies are code/CSS, not prose, and leaking them poisons every
# downstream signal (symbol density, language id, dedup shingles).
SCRIPT_PATTERN = r"(?is)<script\b[^>]*>.*?</script\s*>"
STYLE_PATTERN = r"(?is)<style\b[^>]*>.*?</style\s*>"
COMMENT_PATTERN = r"(?s)<!--.*?-->"

# Block-level boundaries become newlines so paragraph structure
# survives into the line-level passes (CCNet stripping, Gopher line
# stats); every other tag becomes a space so inline markup does not
# weld adjacent words together ("<b>a</b>b" -> "a b", not "ab").
BLOCK_TAG_PATTERN = (
    r"(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|pre"
    r"|section|article|aside|header|footer|nav|form|figure|figcaption"
    r"|dl|dt|dd|hr)\b[^>]*/?>"
)
OTHER_TAG_PATTERN = r"(?s)<[^>]*>"

# href values, captured for link accounting BEFORE tags are stripped.
# The leading \s rejects custom attributes that merely END in "href"
# (data-href=...) without lookbehind, which RE2 lacks; real href
# attributes are always preceded by whitespace inside their tag.
HREF_PATTERN = r"(?i)\shref\s*=\s*\"([^\"]*)\""

# Literal entity decodes, in single-decode order: the named entities
# first, ``&amp;`` LAST so "&amp;lt;" correctly yields "&lt;" (the
# author escaped an escape) instead of double-decoding to "<".
ENTITY_REPLACEMENTS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

# Whitespace normalization: horizontal runs -> one space, spaces
# hugging a newline dropped, 3+ blank lines -> one blank line, then
# full trim (F.trim only strips spaces, so the trim is a regex too).
_WS_HORIZONTAL = r"[ \t\f\r]+"
_WS_AROUND_NL = r" ?\n ?"
_WS_MANY_NL = r"\n{3,}"
_WS_TRIM = r"(?s)^\s+|\s+$"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def extract_html_text(col: Column | str) -> Column:
    """Extract readable text from an HTML string column.

    Pipeline (each step a builtin ``regexp_replace``/``replace``, all
    evaluated inside whole-stage codegen): drop script/style/comments
    whole -> block tags to newline -> remaining tags to space ->
    decode the common entities (``&amp;`` last) -> normalize
    whitespace -> trim. Null in, null out.
    """
    c = _col(col)
    c = F.regexp_replace(c, SCRIPT_PATTERN, "")
    c = F.regexp_replace(c, STYLE_PATTERN, "")
    c = F.regexp_replace(c, COMMENT_PATTERN, "")
    c = F.regexp_replace(c, BLOCK_TAG_PATTERN, "\n")
    c = F.regexp_replace(c, OTHER_TAG_PATTERN, " ")
    for ent, rep in ENTITY_REPLACEMENTS:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, _WS_HORIZONTAL, " ")
    c = F.regexp_replace(c, _WS_AROUND_NL, "\n")
    c = F.regexp_replace(c, _WS_MANY_NL, "\n\n")
    c = F.regexp_replace(c, _WS_TRIM, "")
    return c.alias("extracted_text")


def html_hrefs(col: Column | str) -> Column:
    """All ``href="..."`` values of an HTML column, in document order
    (``array<string>``) — run BEFORE extraction (tags are gone after).
    Feeds the existing link-graph operators (`operators/web.py`)."""
    return F.regexp_extract_all(_col(col), F.lit(HREF_PATTERN), 1).alias(
        "hrefs"
    )


# Full <a> elements: group 1 = href value, group 2 = inner HTML.
# Lazy inner match, no lookaround (RE2-portable); nested anchors are
# invalid HTML and out of heuristic scope.
ANCHOR_PATTERN = (
    r"(?is)<a\s[^>]*href\s*=\s*\"([^\"]*)\"[^>]*>(.*?)</a\s*>"
)


def html_anchors(col: Column | str) -> Column:
    """All links of an HTML column as ``array<struct<href,
    anchor_html>>`` in document order — the raw material for an
    anchor-text table (the web-search-style signal: what OTHER pages'
    link text says a URL is about). ``anchor_html`` is the raw inner
    HTML; run :func:`extract_html_text` over it after exploding to get
    clean anchor text (inline markup and entities are common inside
    anchors). Alignment of the two legs is structural: both
    ``regexp_extract_all`` calls run the SAME pattern, so index i of
    each array comes from the same match."""
    c = _col(col)
    return F.arrays_zip(
        F.regexp_extract_all(c, F.lit(ANCHOR_PATTERN), 1).alias("href"),
        F.regexp_extract_all(c, F.lit(ANCHOR_PATTERN), 2).alias(
            "anchor_html"
        ),
    ).alias("anchors")


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def html_text_sql(expr: str) -> str:
    """DuckDB SQL replaying :func:`extract_html_text` on ``expr`` —
    built from the SAME pattern constants, so the two engines cannot
    drift (the PII-pattern precedent). Newline replacements are
    ``chr(10)`` expressions to keep the SQL source single-line-safe."""
    s = expr
    for pat in (SCRIPT_PATTERN, STYLE_PATTERN, COMMENT_PATTERN):
        s = f"regexp_replace({s}, {_sql_str(pat)}, '', 'g')"
    s = f"regexp_replace({s}, {_sql_str(BLOCK_TAG_PATTERN)}, chr(10), 'g')"
    s = f"regexp_replace({s}, {_sql_str(OTHER_TAG_PATTERN)}, ' ', 'g')"
    for ent, rep in ENTITY_REPLACEMENTS:
        s = f"replace({s}, {_sql_str(ent)}, {_sql_str(rep)})"
    s = f"regexp_replace({s}, {_sql_str(_WS_HORIZONTAL)}, ' ', 'g')"
    s = (
        f"regexp_replace({s}, {_sql_str(_WS_AROUND_NL)}, chr(10), 'g')"
    )
    s = (
        f"regexp_replace({s}, {_sql_str(_WS_MANY_NL)},"
        " chr(10) || chr(10), 'g')"
    )
    s = f"regexp_replace({s}, {_sql_str(_WS_TRIM)}, '', 'g')"
    return s
