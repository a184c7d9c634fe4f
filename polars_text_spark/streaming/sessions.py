"""Custom stateful streaming: event sessionization with a gap timeout.

The one Structured Streaming shape the built-in windowed aggregations
can't express: group events into per-user *sessions* that close after
``gap`` of inactivity. Implemented with ``applyInPandasWithState`` —
per-key state holds the open session (start, last event time, counts)
and a processing-time timeout flushes sessions whose gap elapsed
(SURVEY.md scope note: the reference has no streaming surface at all;
this is part of the beyond-reference pipeline layer).

The same grouping logic is exposed as a batch function
(:func:`sessionize_batch`, pure Spark window expressions) — the
batch/stream pair mirrors ``windowed_event_counts`` and gives the
equivalence tests something exact to compare against.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["SESSION_SCHEMA", "sessionize_batch", "sessionize_stream"]

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )
            return

        events = pd.concat(list(batches)).sort_values("ts")
        ts_us = (events["ts"].astype("int64") // 1000).tolist()
        values = events["value"].tolist()

        closed: list[tuple[int, int, int, float]] = []
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = ts_us[0], ts_us[0], 0, 0.0

        for t_us, value in zip(ts_us, values):
            if t_us - last_us > gap_us and n > 0:
                closed.append((start_us, last_us, n, total))
                start_us, n, total = t_us, 0, 0.0
            last_us = max(last_us, t_us)
            n += 1
            total += float(value)

        state.update((start_us, last_us, n, total))
        state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, *, gap_seconds: int = 1800
) -> DataFrame:
    """Per-user sessions over a streaming events frame; a session
    closes ``gap_seconds`` after its last event (processing-time
    timeout flushes idle keys).

    Ordering contract: sessions are cut on the event-time gaps as
    observed in arrival order (events are sorted within each
    micro-batch). Output equals :func:`sessionize_batch` exactly when
    cross-batch disorder never spans a session boundary — i.e. the
    source delivers roughly time-ordered chunks (Kafka per-key order,
    time-partitioned file drops). For arbitrarily shuffled replays,
    use the batch twin.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, *, gap_seconds: int = 1800) -> DataFrame:
    """Batch twin: classic gaps-and-islands with window expressions —
    new session when the gap to the previous event exceeds the
    threshold; one shuffle on user_id."""
    by_user = Window.partitionBy("user_id").orderBy("ts")
    # Gap in MICROSECONDS — the stream twin compares ts_us diffs to
    # gap_us, and event timestamps carry sub-second components; a
    # whole-second cast would disagree on e.g. a 3600.5 s gap.
    gapped = events.withColumn(
        "__new_session",
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(by_user)
            > gap_seconds * 1_000_000
        )
        .cast("int")
        .alias("__new_session"),
    ).withColumn(
        "__session_id",
        F.sum(F.coalesce("__new_session", F.lit(1))).over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return gapped.groupBy("user_id", "__session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).drop("__session_id")
