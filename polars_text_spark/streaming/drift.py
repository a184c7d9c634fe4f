"""Windowed distribution-drift monitor: per event-time window, the
KL divergence of the window's token distribution against a static
reference vocabulary — the standing data-quality alarm a production
ingest runs next to its pipeline (a crawl source going spammy, an
encoding regression, or a topic shift shows up as a KL spike within
one window of landing).

Batch twin (`source_kl_divergence` in operators/quality.py) answers
"which SOURCE drifted" over a static corpus; this answers "did the
stream drift NOW" continuously. One shared transform runs on either a
batch or a streaming DataFrame (the events.py convention), so the
stream==batch equivalence test is the correctness proof.

Math: with per-window token counts ``c_t`` (``N = sum c_t``) and
smoothed reference probabilities
``q_t = (ref_cnt_t + 1) / (ref_total + |V| + 1)`` (one extra
smoothing slot so out-of-vocabulary tokens get ``q_oov = 1 / den`` and
the divergence stays finite),

``KL(P_w || Q) = sum p_t * ln(p_t / q_t)
              = (sum c_t * (ln c_t - ln q_t)) / N  -  ln N``

which needs only two per-window sums over (token, count) rows — the
chained-aggregation shape Structured Streaming supports in append
mode since Spark 3.4 (`window_time` re-windowing).

Scale: the reference log-prob table is vocab-sized and BROADCAST into
the token stream before any state (a stream-static join is
stateless); aggregation 1 keys on (window, token) with map-side
partial combine; aggregation 2 reduces each window to one row. State
is bounded by watermark x active-vocab, text never enters state, and
the output is one row per window. The only driver action is a 1-row
total over the STATIC reference at construction time (the
mixture_rebalance precedent — the totals must be literals so the OOV
fill is a constant expression).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_text_spark.functions.analysis import ws_token_array

__all__ = ["windowed_token_drift"]


def windowed_token_drift(
    df: DataFrame,
    reference: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window token-distribution drift vs a static ``reference``
    ``(token, cnt)`` frame (as built by
    :func:`~polars_text_spark.operators.quality.unigram_frequencies`).

    Returns ``(window_start, window_end, n_tokens, n_distinct,
    kl_nats)`` — one row per event-time window. Works identically on
    a batch or streaming DataFrame; on a stream use append output
    mode (chained stateful aggregations reject complete mode) and
    expect a window's row once the watermark passes its end."""
    row = reference.agg(
        F.sum("cnt").alias("t"), F.count("*").alias("v")
    ).first()
    den = float((row["t"] or 0) + (row["v"] or 0) + 1)
    log_q_oov = math.log(1.0 / den)
    ref = reference.select(
        "token", F.log((F.col("cnt") + 1.0) / F.lit(den)).alias("__logq")
    )

    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    toks = src.select(
        F.col(ts_col).alias("__ts"),
        F.explode(ws_token_array(text_col)).alias("token"),
    )
    scored = toks.join(F.broadcast(ref), "token", "left").select(
        "__ts",
        "token",
        F.coalesce("__logq", F.lit(log_q_oov)).alias("__logq"),
    )
    counts = scored.groupBy(
        F.window("__ts", window).alias("w"), "token", "__logq"
    ).agg(F.count("*").alias("__cnt"))

    # second aggregation keys on the SAME window; a stream must
    # re-window through window_time (the Spark 3.4+ chained-stateful
    # contract), a batch frame can group the window struct directly
    if df.isStreaming:
        regrouped = counts.groupBy(
            F.window(F.window_time("w"), window).alias("w2")
        )
    else:
        regrouped = counts.groupBy(F.col("w").alias("w2"))
    out = regrouped.agg(
        F.sum("__cnt").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(
            F.col("__cnt") * (F.log("__cnt") - F.col("__logq"))
        ).alias("__s2"),
    )
    return out.select(
        F.col("w2.start").alias("window_start"),
        F.col("w2.end").alias("window_end"),
        "n_tokens",
        "n_distinct",
        (F.col("__s2") / F.col("n_tokens") - F.log("n_tokens")).alias(
            "kl_nats"
        ),
    )
