"""Token-budget epoch planner: solver water-filling vs a Python
reference, cap/unreachable edges, and deterministic materialization."""

from __future__ import annotations

import hashlib

import pytest

from polars_text_spark.operators.budget import apply_epoch_plan, epoch_plan


def test_uncapped_plan_hits_budget_and_mixture():
    counts = {"a": 1000, "b": 500, "c": 500}
    plan = epoch_plan(
        counts, {"a": 0.5, "b": 0.25, "c": 0.25}, 3000, max_epochs=4.0
    )
    contrib = {s: plan[s] * counts[s] for s in plan}
    assert sum(contrib.values()) == pytest.approx(3000)
    assert contrib["a"] == pytest.approx(1500)
    assert contrib["b"] == contrib["c"] == pytest.approx(750)


def test_capped_source_redistributes_to_others():
    # ideal r_b = 4000*0.5/200 = 10 >> cap; b contributes 2*200=400,
    # the rest flows to a
    counts = {"a": 10_000, "b": 200}
    plan = epoch_plan(counts, {"a": 0.5, "b": 0.5}, 4000, max_epochs=2.0)
    assert plan["b"] == 2.0
    assert plan["a"] * counts["a"] == pytest.approx(4000 - 400)


def test_cascading_caps_converge():
    counts = {"a": 100, "b": 200, "c": 100_000}
    plan = epoch_plan(
        counts, {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, 9000, max_epochs=3.0
    )
    assert plan["a"] == 3.0 and plan["b"] == 3.0
    assert plan["c"] * counts["c"] == pytest.approx(9000 - 300 - 600)
    total = sum(plan[s] * counts[s] for s in plan)
    assert total == pytest.approx(9000)


def test_unreachable_budget_raises():
    with pytest.raises(ValueError, match="exceeds max reachable"):
        epoch_plan({"a": 100}, {"a": 1.0}, 1000, max_epochs=2.0)
    with pytest.raises(ValueError, match="no tokens"):
        epoch_plan({"a": 0}, {"a": 1.0}, 10)
    with pytest.raises(ValueError, match="positive"):
        epoch_plan({"a": 100}, {"a": 0.0}, 10)


def _py_keep(doc_id: int, epoch: int, r: float, salt: str) -> bool:
    if epoch <= int(r):
        return True
    h = hashlib.sha256(f"{doc_id}:{epoch}{salt}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60) < r - int(r)


def test_apply_matches_python_reference(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plan = {"a": 2.4, "b": 0.7}
    got = sorted(
        (r["doc_id"], r["epoch"])
        for r in apply_epoch_plan(
            df, plan, "source", "doc_id", salt="s"
        ).collect()
    )
    exp = sorted(
        (i, e)
        for i, src in rows
        if src in plan
        for e in range(1, int(-(-plan[src] // 1)) + 1)
        if _py_keep(i, e, plan[src], "s")
    )
    assert got == exp
    # determinism under re-execution
    got2 = sorted(
        (r["doc_id"], r["epoch"])
        for r in apply_epoch_plan(
            df, plan, "source", "doc_id", salt="s"
        ).collect()
    )
    assert got2 == got


def test_apply_drops_unplanned_sources_and_integer_epochs_exact(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "zzz")], "doc_id long, source string"
    )
    out = apply_epoch_plan(df, {"a": 2.0}, "source", "doc_id").collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in out) == [(1, 1), (1, 2)]
    with pytest.raises(ValueError, match="empty"):
        apply_epoch_plan(df, {}, "source", "doc_id")
    with pytest.raises(ValueError, match="negative"):
        apply_epoch_plan(df, {"a": -1.0}, "source", "doc_id")


def test_apply_zero_rate_drops_source(spark):
    """An explicit 0.0 plan entry must drop the source entirely —
    sequence(1, ceil(0)) yields the DESCENDING [1, 0] and the epoch-0
    row would otherwise pass the `epoch <= floor(0)` keep filter."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b")], "doc_id long, source string"
    )
    out = apply_epoch_plan(
        df, {"a": 1.0, "b": 0.0}, "source", "doc_id"
    ).collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in out) == [(1, 1)]


def test_apply_is_map_only(spark):
    from polars_text_spark.plans.explain import explain_str

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = explain_str(
        apply_epoch_plan(df, {"a": 1.5}, "source", "doc_id"), "formatted"
    )
    assert "Exchange" not in plan
