"""Token-budget epoch planning — "how many times does each source
repeat" for data-constrained pretraining (the mixing step every
LLaMA-style run does: fix a total token budget, target mixture
weights, and a repetition cap, then up/down-sample each source to
hit the budget; repetition beyond ~4 epochs stops helping — Scaling
Data-Constrained Language Models, Muennighoff et al. 2023,
arXiv:2305.16264).

:func:`epoch_plan` is the water-filling solver: pure arithmetic on
the per-source token counts (a |sources|-row dict, the
mixture_rates precedent — rates must be literals so the application
is engine-replayable). :func:`apply_epoch_plan` materializes the
plan distributively: integer epochs explode each document
``floor(r_s)`` times and the fractional epoch survives via the
content-keyed sha draw — map-only, no shuffle, deterministic under
reruns and engine replay.

Scale: the only non-map work is the per-source token count (one
groupBy over |sources| keys, map-side combined). The explode
multiplies rows by at most ``ceil(max_epochs)`` — the physical copy
is usually the WRONG materialization at 100 TB (prefer carrying
``n_epochs`` into the sampler/packer), which is why the epoch index
is a column: downstream packing can treat (doc, epoch) as the unit
without ever duplicating text bytes (project the id-epoch frame,
join text back at the consumer).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.operators.sampling import key_uniform

__all__ = ["apply_epoch_plan", "epoch_plan"]


def epoch_plan(
    counts: Mapping[str, int],
    weights: Mapping[str, float],
    budget_tokens: int,
    *,
    max_epochs: float = 4.0,
) -> dict[str, float]:
    """Per-source epoch factors ``r_s`` such that source ``s``
    contributes ``r_s * n_s`` tokens, ``sum(r_s * n_s) ==
    budget_tokens`` (when reachable), the contributed mixture follows
    ``weights`` as closely as the cap allows, and ``r_s <=
    max_epochs``.

    Water-filling: start from the ideal ``r_s = budget * w_s / n_s``;
    clamp every source over the cap to ``max_epochs`` and
    redistribute the unplaced budget over the uncapped sources by
    renormalized weights; repeat until stable (<= |sources| rounds).
    If the budget exceeds ``max_epochs * sum(n_s)`` every source caps
    and the budget is unreachable — raise rather than silently
    under-deliver tokens."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    pos = {s: w for s, w in weights.items() if w > 0}
    if not pos:
        raise ValueError("weights must contain at least one positive entry")
    missing = [s for s in pos if counts.get(s, 0) <= 0]
    if missing:
        raise ValueError(f"no tokens for target sources: {missing}")
    capacity = max_epochs * sum(counts[s] for s in pos)
    if budget_tokens > capacity:
        raise ValueError(
            f"budget {budget_tokens} exceeds max reachable "
            f"{capacity:.0f} tokens (= max_epochs * available); raise "
            "max_epochs or lower the budget"
        )
    plan: dict[str, float] = {}
    remaining = dict(pos)
    budget = float(budget_tokens)
    while remaining:
        wsum = sum(remaining.values())
        over = {
            s: w
            for s, w in remaining.items()
            if budget * w / wsum / counts[s] >= max_epochs
        }
        if not over:
            for s, w in remaining.items():
                plan[s] = budget * w / wsum / counts[s]
            break
        for s in over:
            plan[s] = max_epochs
            budget -= max_epochs * counts[s]
            del remaining[s]
    return plan


def apply_epoch_plan(
    df: DataFrame,
    plan: Mapping[str, float],
    source_col: str,
    key_col: str,
    *,
    epoch_col: str = "epoch",
    salt: str = "",
) -> DataFrame:
    """Materialize an :func:`epoch_plan`: each row of a planned source
    appears ``floor(r_s)`` times (``epoch_col`` = 1..floor) plus one
    more with probability ``frac(r_s)`` via the content-keyed draw
    ``key_uniform(key || ':' || epoch, salt)`` — deterministic per
    (row, epoch), so reruns and the SQL oracle agree on the exact row
    multiset. Sources absent from the plan are dropped (epoch 0).

    Map-only: an explode over ``ceil(r_s)`` literals and a filter; no
    shuffle, no driver state beyond the literal plan."""
    if not plan:
        raise ValueError("plan is empty; nothing to materialize")
    for s, r in plan.items():
        if r < 0:
            raise ValueError(f"negative epoch factor for {s!r}: {r}")
    # flat literal map, not a nested CASE chain: a per-domain plan can
    # carry thousands of sources, and element_at on a literal map stays
    # one expression node deep where stacked whens blow up codegen
    entries = []
    for s, r in plan.items():
        entries.append(F.lit(s))
        entries.append(F.lit(float(r)))
    rate = F.element_at(F.create_map(*entries), F.col(source_col))
    # __epochs > 0 (not just non-null): sequence(1, ceil(0)) yields the
    # DESCENDING array [1, 0], and the epoch-0 row would pass the
    # `epoch <= floor(0)` keep filter — a zero-rate plan entry must
    # drop the source, exactly like an absent one.
    d = df.withColumn("__epochs", rate).filter(F.col("__epochs") > 0)
    d = d.withColumn(
        epoch_col,
        F.explode(
            F.sequence(F.lit(1), F.ceil(F.col("__epochs")).cast("int"))
        ),
    )
    draw_key = F.concat(
        F.col(key_col).cast("string"), F.lit(":"), F.col(epoch_col)
    )
    keep = (F.col(epoch_col) <= F.floor("__epochs")) | (
        key_uniform(draw_key, salt)
        < (F.col("__epochs") - F.floor("__epochs"))
    )
    return d.filter(keep).drop("__epochs")
