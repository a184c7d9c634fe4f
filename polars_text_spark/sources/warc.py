"""WARC (Web ARChive, ISO 28500) ingestion — the container format of
Common Crawl and every serious web-crawl corpus.

Beyond-reference source. The reference ingests whatever its host
engine reads (CSV/NDJSON/parquet); a 100 TB pretraining pipeline's
raw input is WARC, so the engine needs a native reader: one row per
WARC record, HTTP envelope split off, payload as opaque binary that
flows straight into the existing web-curation chain (html_extract →
language id → quality → dedup).

Design:

- **Record parsing is Content-Length-driven, never delimiter-split.**
  Payloads are binary and routinely contain ``\\r\\n\\r\\n``; the only
  correct framing is the declared byte length. Structurally broken
  input stops the sweep and returns the records parsed so far
  (defensive posture shared with operators/multimodal.py header
  parsers — a corrupt tail must not kill an hour-9 job).
- **Files are tasks, records are rows.** WARC members are
  per-record gzip streams — not splittable mid-file — so the unit of
  parallelism is the FILE, exactly how Common Crawl shards are laid
  out (~1 GB each, ~100k shards per crawl: plenty of tasks for any
  cluster). ``spark.read.format("binaryFile")`` + ``mapInPandas``
  keeps one file per task and streams records out as Arrow batches.
  Whole-file bytes live in task memory: size executors for the shard
  size (Common Crawl's ~1 GB compressed / ~4-5 GB inflated fits the
  usual 8-16 GB task budget; recompress bigger custom dumps first).
- **The parser is a COLUMN operator too** (:func:`parse_warc_records`
  over any binary column), so a fully engine-replayable round-trip
  query can synthesize valid WARC bytes JVM-side and the DuckDB
  oracle can re-derive every parsed field without ever seeing the
  container — the same encode/decode pinning strategy as the PCM
  audio path (operators/multimodal.py).
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "WARC_RECORD_TYPE",
    "parse_warc_records",
    "read_warc",
    "warc_text_documents",
]

WARC_RECORD_TYPE = T.StructType(
    [
        T.StructField("record_id", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _parse_warc_bytes(data: bytes | None) -> list[dict]:
    """Sweep every WARC record out of one (possibly gzipped) blob.

    Returns one dict per record. ``payload`` is the HTTP BODY for
    ``response`` records carrying an HTTP envelope (status and
    Content-Type lifted into their own fields), the raw record block
    otherwise. Structural damage (missing header terminator, short
    payload) ends the sweep; records already parsed are kept."""
    if not data:
        return []
    if data[:2] == b"\x1f\x8b":
        try:
            # gzip handles concatenated members (the per-record
            # compression WARC prescribes) transparently
            data = gzip.decompress(data)
        except (OSError, EOFError):
            # EOFError is NOT an OSError: a shard truncated
            # mid-member must degrade, not kill the job
            return []
    records: list[dict] = []
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record CRLF padding
        while i < n and data[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if not data[i : i + 5] == b"WARC/":
            break
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[i:hdr_end].split(b"\r\n")[1:]:
            name, sep, value = line.partition(b":")
            if sep:
                headers[name.strip().lower().decode("latin-1")] = (
                    value.strip().decode("latin-1", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if length < 0 or body_start + length > n:
            break
        block = data[body_start : body_start + length]
        i = body_start + length
        rec = {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "content_length": length,
            "http_status": None,
            "content_type": headers.get("content-type"),
            "payload": block,
        }
        if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
            http_end = block.find(b"\r\n\r\n")
            if http_end >= 0:
                lines = block[:http_end].split(b"\r\n")
                status_parts = lines[0].split()
                if len(status_parts) >= 2 and status_parts[1].isdigit():
                    rec["http_status"] = int(status_parts[1])
                for line in lines[1:]:
                    name, sep, value = line.partition(b":")
                    if sep and name.strip().lower() == b"content-type":
                        rec["content_type"] = value.strip().decode(
                            "latin-1", "replace"
                        )
                rec["payload"] = block[http_end + 4 :]
        records.append(rec)
    return records


def parse_warc_records(col: Column | str) -> Column:
    """``array<struct>`` of every WARC record in a binary column
    (Arrow-batched pandas UDF; null/garbage bytes -> empty array).
    Explode it for one row per record."""

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            yield pd.Series([_parse_warc_bytes(data) for data in series])

    c = F.col(col) if isinstance(col, str) else col
    return F.pandas_udf(fn, T.ArrayType(WARC_RECORD_TYPE))(c).alias(
        "warc_records"
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record under ``path`` (glob ok):
    ``(path, record_id, warc_type, target_uri, content_length,
    http_status, content_type, payload)``. Gzipped members inflate
    transparently. One file = one task — Common Crawl's sharding is
    the parallelism."""
    files = spark.read.format("binaryFile").load(path)
    return files.select(
        "path", F.explode(parse_warc_records("content")).alias("r")
    ).select("path", "r.*")


def warc_text_documents(
    records: DataFrame, *, status: int = 200
) -> DataFrame:
    """Filter a :func:`read_warc` frame to textual HTTP ``status``
    responses and decode the body to a string column ``text``
    (UTF-8, invalid bytes replaced — a web crawl always carries some
    mojibake; route the output through mojibake_signals /
    clean_text downstream). Keeps ``(target_uri, content_type,
    text)``."""
    textual = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == status)
        & (
            F.col("content_type").startswith("text/")
            | F.col("content_type").contains("html")
        )
    )
    # NOT F.decode: under Spark 4's ANSI default, decode THROWS on
    # malformed UTF-8 (MALFORMED_CHARACTER_CODING) — and a real crawl
    # guarantees malformed bytes. binary->string cast copies the
    # bytes unvalidated; make_valid_utf8 then substitutes U+FFFD,
    # i.e. errors='replace'.
    return textual.select(
        "target_uri",
        "content_type",
        F.make_valid_utf8(F.col("payload").cast("string")).alias("text"),
    )
