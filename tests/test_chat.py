"""Conversation lint/render (operators/chat.py): hand cases for every
lint rule, the zip_with equal-length-slice regression, and map-only
execution."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.chat import (
    chat_stats,
    parse_chat,
    render_chat,
)


def _lint(spark, convos):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(convos)], "i int, j string"
    )
    parsed = df.select("i", parse_chat("j").alias("a"))
    rows = parsed.select(
        "i",
        chat_stats("a").alias("s"),
        render_chat("a").alias("r"),
    ).collect()
    return {r.i: r for r in sorted(rows, key=lambda r: r.i)}


def test_chat_lint_rules(spark):
    rows = _lint(
        spark,
        [
            # 0: canonical valid conversation
            '[{"role":"system","content":"s"},'
            '{"role":"user","content":"u"},'
            '{"role":"assistant","content":"a"}]',
            # 1: adjacent user turns
            '[{"role":"user","content":"u"},{"role":"user","content":"v"},'
            '{"role":"assistant","content":"a"}]',
            # 2: system mid-conversation
            '[{"role":"user","content":"u"},'
            '{"role":"system","content":"s"},'
            '{"role":"assistant","content":"a"}]',
            # 3: trailing user turn (no training signal)
            '[{"role":"user","content":"u"},'
            '{"role":"assistant","content":"a"},'
            '{"role":"user","content":"w"}]',
            # 4: empty content
            '[{"role":"user","content":"u"},'
            '{"role":"assistant","content":""}]',
            # 5: malformed JSON
            "not json at all",
            # 6: empty conversation
            "[]",
            # 7: single user turn
            '[{"role":"user","content":"u"}]',
        ],
    )
    s0 = rows[0].s
    assert s0.valid and s0.adjacent_ok and s0.starts_ok
    assert s0.n_turns == 3 and s0.n_system == 1
    assert rows[0].r == "<|system|>s\n<|user|>u\n<|assistant|>a\n"
    assert not rows[1].s.valid and not rows[1].s.adjacent_ok
    assert rows[1].s.starts_ok  # only the adjacency rule fires
    assert not rows[2].s.valid and not rows[2].s.system_at_head_only
    assert rows[2].s.adjacent_ok  # roles do alternate
    assert not rows[3].s.valid and not rows[3].s.ends_with_assistant
    assert not rows[4].s.valid and rows[4].s.n_empty_content == 1
    s5 = rows[5].s
    assert not s5.parsed_ok and not s5.valid
    s6 = rows[6].s
    assert s6.n_turns == 0 and not s6.valid and not s6.starts_ok
    assert rows[6].r == ""
    # single turn: adjacency is vacuously fine (the zip_with padding
    # regression made this null), but it fails starts/ends rules
    s7 = rows[7].s
    assert s7.adjacent_ok and not s7.ends_with_assistant and not s7.valid


def test_chat_ops_map_only(spark):
    df = spark.range(10).select(
        F.lit('[{"role":"user","content":"u"}]').alias("j")
    )
    from polars_text_spark.plans import explain_str

    parsed = df.select(parse_chat("j").alias("a"))
    plan = explain_str(
        parsed.select(chat_stats("a"), render_chat("a")), "formatted"
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
