"""WARC ingestion (sources/warc.py): record framing, HTTP envelope
split, gzip member transparency, and the defensive posture against
truncated/corrupt containers."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from polars_text_spark.sources.warc import (
    _parse_warc_bytes,
    parse_warc_records,
    read_warc,
    warc_text_documents,
)


def _record(
    body: bytes,
    *,
    uri: str = "https://example.org/",
    warc_type: str = "response",
    http: bool = True,
    status: int = 200,
    ctype: str = "text/html",
) -> bytes:
    if http:
        payload = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n\r\n".encode()
            + body
        )
    else:
        payload = body
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type.encode() + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload
        + b"\r\n\r\n"
    )


def test_multi_record_sweep_and_http_split():
    blob = _record(b"<html>a</html>") + _record(
        b"robots", warc_type="resource", http=False
    )
    recs = _parse_warc_bytes(blob)
    assert len(recs) == 2
    assert recs[0]["warc_type"] == "response"
    assert recs[0]["http_status"] == 200
    assert recs[0]["content_type"] == "text/html"
    assert recs[0]["payload"] == b"<html>a</html>"
    # non-HTTP record: raw block, no status, WARC-level content type
    assert recs[1]["warc_type"] == "resource"
    assert recs[1]["http_status"] is None
    assert recs[1]["payload"] == b"robots"


def test_binary_safe_framing():
    """A body containing the header terminator sequence must not
    derail framing — only Content-Length decides where records end."""
    tricky = b"x\r\n\r\nWARC/1.0\r\n\r\ny"
    blob = _record(tricky) + _record(b"second")
    recs = _parse_warc_bytes(blob)
    assert len(recs) == 2
    assert recs[0]["payload"] == tricky
    assert recs[1]["payload"] == b"second"


def test_truncated_tail_keeps_parsed_records():
    good = _record(b"complete")
    bad = _record(b"this one is cut")[:-20]
    recs = _parse_warc_bytes(good + bad)
    assert len(recs) == 1
    assert recs[0]["payload"] == b"complete"
    assert _parse_warc_bytes(b"not warc at all") == []
    assert _parse_warc_bytes(None) == []
    assert _parse_warc_bytes(b"\x1f\x8bgarbage gzip") == []


def test_gzip_members_inflate_transparently():
    blob = gzip.compress(_record(b"a")) + gzip.compress(_record(b"b"))
    recs = _parse_warc_bytes(blob)
    assert [r["payload"] for r in recs] == [b"a", b"b"]


def test_read_warc_files_and_text_documents(spark, tmp_path):
    p1 = tmp_path / "shard-00000.warc"
    p1.write_bytes(
        _record(b"<html>hello</html>", uri="https://a.example/x")
        + _record(b"binary!", ctype="image/png", uri="https://a.example/i")
        + _record(b"gone", status=404, uri="https://a.example/404")
    )
    p2 = tmp_path / "shard-00001.warc.gz"
    p2.write_bytes(
        gzip.compress(_record(b"zipped page", uri="https://b.example/y"))
    )
    recs = read_warc(spark, str(tmp_path))
    assert recs.count() == 4
    docs = {
        r["target_uri"]: r["text"]
        for r in warc_text_documents(recs).collect()
    }
    # textual 200s only: the png and the 404 are filtered
    assert docs == {
        "https://a.example/x": "<html>hello</html>",
        "https://b.example/y": "zipped page",
    }


def test_parse_warc_records_column_form(spark):
    df = spark.createDataFrame(
        [(1, _record(b"col form")), (2, None)], "id int, b binary"
    )
    out = {
        r["id"]: r["n"]
        for r in df.select(
            "id", F.size(parse_warc_records("b")).alias("n")
        ).collect()
    }
    assert out == {1: 1, 2: 0}  # null bytes -> empty record array


def test_truncated_gzip_member_degrades_not_dies():
    """EOFError from a mid-member cut is not an OSError — it must be
    swallowed like any other structural damage."""
    cut = gzip.compress(_record(b"payload"))[:-5]
    assert _parse_warc_bytes(cut) == []


def test_warc_text_documents_survives_malformed_utf8(spark, tmp_path):
    """A real crawl guarantees malformed bytes; the decode must
    substitute U+FFFD (errors='replace'), never throw — under Spark
    4's ANSI default, F.decode raises MALFORMED_CHARACTER_CODING."""
    p = tmp_path / "bad.warc"
    p.write_bytes(_record(b"latin1 caf\xe9 bytes", uri="https://x.example/"))
    docs = warc_text_documents(read_warc(spark, str(tmp_path))).collect()
    assert len(docs) == 1
    assert "caf� bytes" in docs[0]["text"]
