"""Deterministic, engine-portable sampling for corpus curation.

``df.sample()`` is seed-dependent per partition split, so it can't be
reproduced by another engine or even by the same job after a
repartition. Training-data pipelines need *content-keyed* sampling:
whether a row is kept depends only on its key, so reruns, backfills,
and a DuckDB audit all agree row-for-row.

Mechanism: keep a row iff the first 8 hex chars of
``sha256(key || salt)`` are lexicographically below a threshold
encoding the rate. Lowercase-hex string compare == numeric compare,
and both Spark ``sha2`` and DuckDB ``sha256`` emit lowercase hex, so
the predicate is bit-identical across engines. Pure Catalyst
expressions — at 100 TB this is a filter fused into the scan.
"""

from __future__ import annotations

import math
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cap_per_group",
    "key_uniform",
    "mixture_rates",
    "mixture_rebalance",
    "sample_predicate",
    "deterministic_sample",
    "stratified_sample",
    "temperature_rates",
    "temperature_rebalance",
    "weighted_sample",
]

_HEX_SPAN = 16 ** 8  # first 8 hex chars -> uniform over [0, 2^32)


def rate_threshold_hex(rate: float) -> str:
    """Hex threshold string for a keep-rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * _HEX_SPAN), _HEX_SPAN - 1), "08x")


def sample_predicate(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean keep-predicate: uniform ``rate`` fraction of keys."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    h = F.sha2(F.concat(key.cast("string"), F.lit(salt)), 256)
    return F.substring(h, 1, 8) < F.lit(rate_threshold_hex(rate))


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, keyed by
    ``key_col``. Identical keys always land on the same side, so the
    sample is stable under reruns and co-sampled across tables
    sharing the key (the salt decorrelates independent samples)."""
    return df.filter(sample_predicate(F.col(key_col), rate, salt))


def key_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform draw in [0, 1) from a key: the first 15
    hex chars of ``sha256(key || salt)`` as a 60-bit integer over
    2^60 — the same engine-portable recipe as the dedup sha hashes
    (DuckDB twin: ``('0x' || substr(sha256(k), 1, 15))::BIGINT /
    2^60``). Used where the keep-rate varies PER ROW and the constant
    hex-threshold trick of :func:`sample_predicate` cannot apply."""
    h = F.sha2(F.concat(key.cast("string"), F.lit(salt)), 256)
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(
        float(1 << 60)
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Quality-proportional downsampling (the DataComp/Dolma curation
    shape): each row survives with probability ``weight`` (clamped to
    [0, 1]) — a per-row quality score decides how much of the corpus
    mass it keeps, deterministically. Keep iff
    ``key_uniform(key) < weight``: map-only, fused into the scan, no
    shuffle, stable under reruns and engine-replayable (the oracle
    recomputes both the draw and the weight).

    Scale: identical shape to :func:`deterministic_sample` — a filter
    the optimizer pushes to the parquet scan whenever the weight is
    computable from scanned columns."""
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight.cast("double")))
    return df.filter(key_uniform(F.col(key_col), salt) < w)


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    stratum_col: str,
    key_col: str,
    *,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    downsample dominant languages, keep the tail whole). ``rates``
    maps stratum values to keep-rates; unlisted strata — including
    rows whose stratum is NULL, which never equals any listed value —
    use ``default_rate``. Single scan, no shuffle — the stratum rate
    is a CASE expression over the broadcastable rate table."""
    if any(value is None for value in rates):
        raise ValueError(
            "NULL strata cannot be listed in rates; they follow default_rate"
        )
    if not rates and default_rate <= 0.0:
        raise ValueError(
            "stratified_sample with empty rates and default_rate=0 would keep "
            "nothing; pass per-stratum rates or a positive default_rate"
        )
    pred = F.lit(False)
    for value, rate in rates.items():
        pred = pred | (
            (F.col(stratum_col) == value)
            & sample_predicate(F.col(key_col), rate, salt)
        )
    if default_rate > 0.0:
        # NULL-aware "unlisted" test: `~isin(...)` is NULL (not true)
        # for NULL strata, which used to silently drop them even at
        # default_rate=1.0 — OR with an explicit isNull arm.
        listed = F.col(stratum_col).isin(*rates.keys()) if rates else F.lit(False)
        others = F.col(stratum_col).isNull() | ~listed
        pred = pred | (others & sample_predicate(F.col(key_col), default_rate, salt))
    return df.filter(pred)


def mixture_rates(
    counts: Mapping[str, int], weights: Mapping[str, float]
) -> dict[str, float]:
    """Per-stratum keep-rates that hit a target mixture exactly while
    keeping as much data as possible: with ``C = min_s(n_s / w_s)``
    over target strata, stratum ``s`` keeps ``C·w_s`` rows in
    expectation, so the kept corpus's composition equals ``weights``
    and at least one stratum is kept whole (rate 1.0). Strata absent
    from ``weights`` (or with weight 0) get rate 0.

    Pure arithmetic on the (tiny) per-stratum count dict — the same
    formula is expressible in the SQL oracle, so the rebalance stays
    engine-auditable end to end."""
    pos = {s: w for s, w in weights.items() if w > 0}
    if not pos:
        raise ValueError("weights must contain at least one positive entry")
    missing = [s for s in pos if counts.get(s, 0) <= 0]
    if missing:
        raise ValueError(f"no rows for target strata: {missing}")
    scale = min(counts[s] / w for s, w in pos.items())
    return {s: min(1.0, scale * w / counts[s]) for s, w in pos.items()}


def mixture_rebalance(
    df: DataFrame,
    weights: Mapping[str, float],
    stratum_col: str,
    key_col: str,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministically downsample ``df`` so the surviving rows'
    ``stratum_col`` composition matches ``weights`` (e.g. rebalance a
    crawl to a target language mixture before training). Keeps the
    maximum number of rows consistent with the target: the most
    under-represented target stratum is kept whole and every other
    stratum is hash-sampled down to proportion.

    One tiny groupBy-count action fixes the rates (|strata| rows to
    the driver — fine at any corpus scale; the rates must be literals
    for the content-keyed predicate to be reproducible elsewhere),
    then a single scan with the stratified hash predicate does the
    rebalance — no shuffle of the data itself."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col).count().collect()
        if r[0] is not None
    }
    rates = mixture_rates(counts, weights)
    return stratified_sample(
        df, rates, stratum_col, key_col, default_rate=0.0, salt=salt
    )


def temperature_rates(
    counts: Mapping[str, int], alpha: float
) -> dict[str, float]:
    """Per-stratum keep-rates for temperature-scaled sampling: the
    multilingual-pretraining knob where stratum ``s`` is drawn with
    probability proportional to ``n_s^alpha`` (``alpha < 1`` flattens
    the distribution toward low-resource strata; ``alpha = 1`` is the
    natural mixture, i.e. keep everything).

    Derivation: targeting ``w_s ∝ n_s^alpha`` under the keep-the-most
    policy of :func:`mixture_rates` reduces in closed form to
    ``rate_s = (n_min / n_s)^(1 - alpha)`` — the smallest stratum is
    kept whole and every larger one is downsampled by its size ratio
    raised to ``1 - alpha``. The closed form matters beyond elegance:
    it has NO sums (a normalizing total would be fp-order-sensitive
    across engines), and at ``alpha = 0.5`` the power is a square
    root, which IEEE requires to be CORRECTLY rounded — so Python,
    Spark, and DuckDB produce bit-identical rates and the hash
    predicate is engine-replayable exactly. Other alphas go through
    ``pow``, which libms only round faithfully (a last-ulp divergence
    between engines is possible, though it only matters if a key's
    hash lands exactly on the 8-hex-digit threshold boundary).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    pos = {s: n for s, n in counts.items() if s is not None and n > 0}
    if not pos:
        raise ValueError("counts must contain at least one positive stratum")
    n_min = min(pos.values())
    if alpha == 0.5:
        return {s: math.sqrt(n_min / n) for s, n in pos.items()}
    return {
        s: min(1.0, (n_min / n) ** (1.0 - alpha)) for s, n in pos.items()
    }


def temperature_rebalance(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    *,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Deterministically downsample ``df`` to a temperature-scaled
    stratum mixture (surviving composition ∝ ``n_s^alpha``) — the
    standard way to keep low-resource languages visible in a
    web-crawl training mix without physically upsampling anything.

    Same execution shape as :func:`mixture_rebalance`: one tiny
    groupBy-count action fixes the rates as literals (|strata| rows to
    the driver), then a single content-keyed scan filter does the
    rebalance — no shuffle of the data itself, pushdown-compatible."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col).count().collect()
        if r[0] is not None
    }
    rates = temperature_rates(counts, alpha)
    return stratified_sample(
        df, rates, stratum_col, key_col, default_rate=0.0, salt=salt
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    *,
    max_rows: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, chosen by a
    content-keyed pseudo-random ranking — the per-domain frequency cap
    of crawl curation (no single host may dominate the corpus), with
    the same reproducibility contract as the samplers: which rows
    survive depends only on (key, salt), never on partitioning or
    engine RNG.

    Rank within a group = order of ``sha256(key || salt)`` (ties by
    key). One shuffle keyed by ``group_col``; per-group state is the
    window's running count — hot domains cost sort time, not memory.
    A skew-extreme group (one domain = half the corpus) can pre-filter
    with :func:`sample_predicate` at ``~max_rows / group_count`` rate
    before the exact window pass."""
    if max_rows < 1:
        raise ValueError("max_rows must be >= 1")
    from pyspark.sql import Window

    from polars_text_spark.operators._cols import require_free_columns

    require_free_columns(df, ["__cap_rn"], "cap_per_group")
    h = F.sha2(F.concat(F.col(key_col).cast("string"), F.lit(salt)), 256)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__cap_rn", F.row_number().over(w))
        .filter(F.col("__cap_rn") <= max_rows)
        .drop("__cap_rn")
    )
