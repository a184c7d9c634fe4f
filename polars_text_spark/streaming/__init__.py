"""Structured Streaming surfaces.

The reference has no streaming operators (SURVEY.md §1.1: nothing in
src/ is streaming). Everything elementwise in this engine — the scalar
text ops, tokenize, concordance, embedding, language-ID, quality,
fingerprints — is stateless and therefore streaming-safe for free: the
same Column expressions apply unchanged to a ``readStream`` DataFrame.
This package adds the event-stream aggregation patterns a pipeline
needs on top (watermarked windows over the ``events`` table shape).
"""

from polars_text_spark.streaming.drift import windowed_token_drift
from polars_text_spark.streaming.events import (
    read_events_stream,
    windowed_event_counts,
)
from polars_text_spark.streaming.ingest import (
    ann_ingest_batch,
    minhash_ingest_batch,
    stream_into_ann_store,
    stream_into_minhash_store,
)
from polars_text_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

__all__ = [
    "ann_ingest_batch",
    "minhash_ingest_batch",
    "stream_into_ann_store",
    "read_events_stream",
    "stream_into_minhash_store",
    "sessionize_batch",
    "sessionize_stream",
    "windowed_event_counts",
    "windowed_token_drift",
]
