"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics Spark's built-in windowed aggregations can't express
(per-key running accumulators with custom transition logic, timeout
handling, emit-on-change), the arbitrary-state API is the tool: state
lives in the state store partitioned by the grouping key, each
micro-batch streams that key's rows through a Python function as
Arrow-backed pandas batches.

Scale: state is per-key and partitioned — 1000 executors hold 1/1000th
of the keyspace each; the Python hop is Arrow-batched per key-group,
not per row.  Use GroupStateTimeout to bound state for keys that go
quiet (the unbounded-stream requirement).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

RUNNING_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("max_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("mx", DoubleType()),
])


def _update_running(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Transition function: fold this micro-batch's events for one user
    into (count, sum, max) state; emit the updated snapshot."""
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())  # pandas sum skips NaN,
        # matching Spark's null-ignoring SUM
        non_null = pdf["value"].dropna()
        if len(non_null):
            m = float(non_null.max())
            # None (not -inf) when no non-null value has been seen:
            # max(-inf, nan) returns -inf and a fabricated -Infinity
            # would leak into the output as max_value
            mx = m if mx is None else max(mx, m)
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n],
         "total_value": [total], "max_value": [mx]}
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over the event stream —
    emits an updated row per user per micro-batch (Update mode)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_epoch", LongType()),
    StructField("session_last_epoch", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def _make_sessionizer(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def _sessionize(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        """Event-time sessionizer with TIMEOUT-based emission: a
        session row is emitted only when it CLOSES — either an
        intra-batch gap splits it, or the key goes quiet and the
        event-time timeout fires (watermark passes last_ts + gap).
        State per key is one open session tuple — bounded regardless
        of stream length."""
        def session_row(start_us, last_us, n, total):
            return pd.DataFrame({
                "user_id": [key[0]],
                "session_start_epoch": [start_us // 1_000_000],
                "session_last_epoch": [last_us // 1_000_000],
                "n_events": [n],
                "total_value": [total],
            })

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield session_row(start_us, last_us, n, total)
            return

        parts = [p for p in batches if len(p)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True)
        # a NULL ts passes the engine's late-row filter (NULL < wm is
        # not true) but has no place on the event-time axis — dropped
        # here before NaT would convert to int64-min and poison the
        # session bounds / timeout timestamp
        rows = rows.dropna(subset=["ts"]).sort_values("ts")
        if not len(rows):
            return
        # normalize to microsecond epoch regardless of the Arrow
        # datetime64 resolution (ns locally, us under newer Arrow)
        ts_us = (rows["ts"].astype("datetime64[us]").astype("int64")).tolist()
        vals = rows["value"].tolist()
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = ts_us[0], ts_us[0], 0, 0.0
        for t, v in zip(ts_us, vals):
            if t - last_us > gap_us:
                yield session_row(start_us, last_us, n, total)
                start_us, last_us, n, total = t, t, 0, 0.0
            # max/min, not assignment: a LATE event (allowed while the
            # watermark lags) merging into an open session must not
            # REWIND the session end — that would split the session on
            # the next on-time event and set the timeout too early
            last_us = max(last_us, t)
            start_us = min(start_us, t)
            n += 1
            total += float(v)
        state.update((start_us, last_us, n, total))
        # event-time timeout: fires when the WATERMARK (not wall clock)
        # passes last event + gap — exactly the session-close condition
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    return _sessionize


def sessionize_with_timeout(stream: DataFrame,
                            gap_seconds: int = 600) -> DataFrame:
    """Custom stateful sessionization (the operator Spark's built-in
    ``session_window`` expresses declaratively — here via arbitrary
    state to demonstrate the full API: custom transition logic,
    emit-on-close, and ``GroupStateTimeout.EventTimeTimeout`` state
    eviction for keys that go quiet).  ``stream`` must carry a
    watermark on ``ts``; state per user is a single open-session tuple
    (start, last, n, total) — constant bytes per key at any stream
    length, the bounded-state requirement of an unbounded 100 TB
    stream."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
