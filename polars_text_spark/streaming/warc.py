"""Continuous WARC ingestion: a crawler drops ``.warc.gz`` shards
into a directory all day; this source turns each new shard into
parsed records as it lands.

The batch reader (sources/warc.py) rides ``binaryFile``; Structured
Streaming's file source supports the same format, so the streaming
variant is the identical parse chain over ``readStream`` — one shard
per task, records exploded per shard, stateless and therefore
composable with every map-only curation op downstream (html_extract,
language id, quality, Bloom seen-URL gate) and with the store ingest
sinks (``stream_into_bloom_store`` on the canonical URL is the
crawl-frontier ledger).

`pathGlobFilter` defaults to ``*.{warc,warc.gz}`` — an EXACT-suffix
alternation, not ``*.warc*`` — so an in-progress upload with a temp
suffix (``shard.warc.gz.tmp``) is invisible until renamed: the
standard atomic-drop protocol for file streams. (``*.warc*`` would
match the temp name and ingest a torn shard.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_text_spark.sources.warc import parse_warc_records

__all__ = ["read_warc_stream"]


def read_warc_stream(
    spark: SparkSession,
    path: str,
    *,
    glob: str = "*.{warc,warc.gz}",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``sources.warc.read_warc``: one row per WARC
    record from every shard that lands under ``path``. Schema matches
    the batch reader (``path`` + the record struct fields), so
    stream==batch equivalence is testable row-for-row."""
    # streaming file sources require an explicit schema; binaryFile's
    # is fixed by the format
    reader = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path)
    return files.select(
        "path", F.explode(parse_warc_records("content")).alias("r")
    ).select("path", "r.*")
