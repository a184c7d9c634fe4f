"""Conversation (SFT/chat) format operators (beyond-reference:
instruction-tuning data curation).

Post-training corpora arrive as JSON conversations — arrays of
``{role, content}`` turns. Before packing them into training text a
pipeline must parse, LINT (role alternation, stray system turns,
empty contents — the malformed rows that silently poison a chat
template), and RENDER them. All three are pure Catalyst here:
``from_json`` + higher-order array functions (transform / filter /
zip_with / aggregate), map-only, fused into the scan, streaming-safe,
and replayable in any engine with JSON + list functions (the DuckDB
oracle uses ``json_transform`` + ``list_filter``/``list_reduce``).

The lint contract (``chat_stats.valid``):
- parses to a non-null array with at least one turn;
- an optional single ``system`` turn may ONLY open the conversation;
- the first non-system turn is ``user``;
- no two adjacent turns share a role;
- the last turn is ``assistant`` (a trailing user turn has no
  training signal in SFT);
- no turn has null/empty content.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["CHAT_SCHEMA", "chat_stats", "parse_chat", "render_chat"]

CHAT_SCHEMA = "array<struct<role: string, content: string>>"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_chat(col: Column | str) -> Column:
    """Parse a JSON conversation column into
    ``array<struct<role, content>>`` (null on malformed JSON — the
    lint surfaces that as ``parsed_ok = false``)."""
    return F.from_json(_col(col), CHAT_SCHEMA).alias("conversation")


def chat_stats(parsed: Column | str) -> Column:
    """Lint a PARSED conversation column into a struct ``(parsed_ok,
    n_turns, n_system, n_user, n_assistant, n_empty_content,
    starts_ok, adjacent_ok, system_at_head_only, ends_with_assistant,
    valid)`` — every field a higher-order array expression over the
    turn array, no explode, no UDF."""
    a = _col(parsed)
    rs = F.transform(a, lambda x: F.coalesce(x["role"], F.lit("")))
    n = F.size(a)
    tail = F.slice(rs, 2, F.greatest(n - 1, F.lit(0)))

    def count_role(role: str) -> Column:
        return F.size(F.filter(rs, lambda r: r == role)).cast("long")

    n_empty = F.size(
        F.filter(
            a,
            lambda x: x["content"].isNull() | (x["content"] == ""),
        )
    ).cast("long")
    first = F.try_element_at(rs, F.lit(1))
    starts_ok = F.when(n == 0, F.lit(False)).otherwise(
        F.when(
            first == "system",
            (n >= 2) & (F.try_element_at(rs, F.lit(2)) == "user"),
        ).otherwise(first == "user")
    )
    # zip two EQUAL-LENGTH slices (turns 1..n-1 vs 2..n): zip_with
    # pads the shorter array with nulls, so zipping rs against tail
    # would inject a spurious (last, null) pair.
    prev = F.slice(rs, 1, F.greatest(n - 1, F.lit(0)))
    adjacent_ok = F.forall(
        F.zip_with(prev, tail, lambda x, y: x != y), lambda ok: ok
    ) & (n > 0)
    head_only = ~F.exists(tail, lambda r: r == "system")
    ends_ok = (n > 0) & (
        F.try_element_at(rs, F.lit(-1)) == "assistant"
    )
    parsed_ok = a.isNotNull()
    valid = (
        parsed_ok
        & starts_ok
        & adjacent_ok
        & head_only
        & ends_ok
        & (n_empty == 0)
    )
    return F.struct(
        parsed_ok.alias("parsed_ok"),
        n.cast("long").alias("n_turns"),
        count_role("system").alias("n_system"),
        count_role("user").alias("n_user"),
        count_role("assistant").alias("n_assistant"),
        n_empty.alias("n_empty_content"),
        starts_ok.alias("starts_ok"),
        adjacent_ok.alias("adjacent_ok"),
        head_only.alias("system_at_head_only"),
        ends_ok.alias("ends_with_assistant"),
        F.coalesce(valid, F.lit(False)).alias("valid"),
    ).alias("chat_stats")


def render_chat(parsed: Column | str) -> Column:
    """Render a parsed conversation to training text:
    ``<|role|>content\\n`` per turn, left-to-right fold
    (``F.aggregate``), null roles/contents rendered as empty rather
    than poisoning the whole string. The template is deliberately the
    simplest unambiguous one — model-specific chat templates belong
    to the (gated) tokenizer backends, not the engine."""
    a = _col(parsed)
    return F.aggregate(
        a,
        F.lit(""),
        lambda acc, x: F.concat(
            acc,
            F.lit("<|"),
            F.coalesce(x["role"], F.lit("")),
            F.lit("|>"),
            F.coalesce(x["content"], F.lit("")),
            F.lit("\n"),
        ),
    ).alias("rendered")
