"""PII detection and redaction for training-data curation
(beyond-reference LLM-pipeline operator).

Pre-training corpora are routinely scrubbed of emails / phone numbers /
IP addresses before the tokenizer ever sees them. Both the counters and
the redactor are pure Catalyst ``regexp_count`` / ``regexp_replace``
expressions — at 100 TB this is a map-only scan fused into whole-stage
codegen, no shuffle, no UDF.

The patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB): ``\\d``, char classes, bounded repetition, non-capturing
groups, and ``\\b`` word boundaries — so the DuckDB oracle runs the
IDENTICAL pattern strings (exported as module constants).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "EMAIL_PATTERN",
    "IPV4_PATTERN",
    "PHONE_PATTERN",
    "pii_counts",
    "redact_pii",
]

# Ordered so redaction can run email -> ipv4 -> phone without one
# pattern's replacement feeding another (phone requires a leading '+',
# which neither placeholder nor the other patterns produce).
# The phone class allows spaces/tabs but NOT \s (which includes
# newlines): '+1 415 555\n2024 report' must not swallow the unrelated
# digit run on the next line.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_PATTERN = r"\+\d[\d\t ().-]{6,}\d"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str) -> Column:
    """``struct(n_emails, n_ipv4, n_phones)`` match counts per doc
    (NULL text counts as zero everywhere).

    Each pattern is counted INDEPENDENTLY over the raw text, so a
    span can contribute to two counters (a ``+digits`` run inside an
    email's local part counts as a phone too) even though
    :func:`redact_pii` masks it only once, under the first pattern in
    redaction order. Counts answer "how much of each shape appears",
    not "how many redactions will happen"."""
    c = _col(col)

    def n(pattern: str) -> Column:
        return F.coalesce(F.regexp_count(c, F.lit(pattern)), F.lit(0)).cast("long")

    return F.struct(
        n(EMAIL_PATTERN).alias("n_emails"),
        n(IPV4_PATTERN).alias("n_ipv4"),
        n(PHONE_PATTERN).alias("n_phones"),
    )


def redact_pii(
    col: Column | str,
    *,
    email_token: str = "[EMAIL]",
    ip_token: str = "[IP]",
    phone_token: str = "[PHONE]",
) -> Column:
    """Replace every email / IPv4 / phone match with a placeholder
    token. Single projection of three chained ``regexp_replace``
    calls — order is fixed (see pattern comment) so the output is
    deterministic regardless of overlapping candidates."""
    c = _col(col)
    c = F.regexp_replace(c, EMAIL_PATTERN, email_token)
    c = F.regexp_replace(c, IPV4_PATTERN, ip_token)
    c = F.regexp_replace(c, PHONE_PATTERN, phone_token)
    return c
