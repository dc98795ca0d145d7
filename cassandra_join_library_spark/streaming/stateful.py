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

Exactness: value sums accumulate as INTEGER MICROUNITS (int64), not
floats — the repo-wide DECIMAL(18,6) parity convention (see
``functions.scalars.dsum``).  Integer addition is exact and
order-independent, so the final state matches the batch-SQL twin
bit-for-bit regardless of micro-batch boundaries or arrival order —
which is what lets ``stream_stateful_stats_final`` and
``stream_sessionize_final`` carry full DuckDB value oracles.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

_MICRO = 1_000_000


def _micro(v) -> int:
    """Double → DECIMAL(18,6)-equivalent microunits (round-half-away,
    matching DuckDB's CAST(double AS DECIMAL(18,6)))."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        (Decimal(repr(float(v))) * _MICRO).quantize(0, rounding=ROUND_HALF_UP)
    )


RUNNING_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("max_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total_micro", LongType()),
    StructField("mx", DoubleType()),
])


def _update_running(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Transition function: fold this micro-batch's events for one user
    into (count, sum, max) state; emit the updated snapshot.  The sum
    accumulates exact microunits so the final snapshot equals the
    batch ``SUM(CAST(value AS DECIMAL(18,6)))`` twin exactly."""
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0, None
    for pdf in batches:
        n += len(pdf)  # COUNT(*): NULL values still count the row
        non_null = pdf["value"].dropna()  # SUM/MAX ignore NULLs
        for v in non_null:
            total += _micro(v)
        if len(non_null):
            m = float(non_null.max())
            # None (not -inf) when no non-null value has been seen:
            # max(-inf, nan) returns -inf and a fabricated -Infinity
            # would leak into the output as max_value
            mx = m if mx is None else max(mx, m)
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n],
         "total_value": [total / _MICRO], "max_value": [mx]}
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
    StructField("total_micro", LongType()),
])


def _make_sessionizer(gap_seconds: int, sentinel: bool = False):
    gap_us = gap_seconds * 1_000_000

    def _sessionize(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        """Event-time sessionizer with TIMEOUT-based emission: a
        session row is emitted only when it CLOSES — an intra-batch
        gap splits it, the key goes quiet and the event-time timeout
        fires (watermark passes last_ts + gap), or (``sentinel=True``)
        an end-of-stream sentinel row flushes the open session.
        State per key is one open session tuple — bounded regardless
        of stream length."""
        def session_row(start_us, last_us, n, total_micro):
            return pd.DataFrame({
                "user_id": [key[0]],
                "session_start_epoch": [start_us // _MICRO],
                "session_last_epoch": [last_us // _MICRO],
                "n_events": [n],
                "total_value": [total_micro / _MICRO],
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
        sents = rows["sentinel"].tolist() if sentinel else [False] * len(ts_us)

        has_open = state.exists
        if has_open:
            start_us, last_us, n, total = state.get
            # A watermark-permitted late event more than gap BEFORE the
            # open session belongs to an EARLIER session — min-merging
            # it into the open one would fabricate a session spanning a
            # silence longer than the gap.  Split those off (they sort
            # first) and sessionize them standalone; each such session
            # closes by construction (its last event is still > gap
            # before the open session's start), so emit immediately.
            early = [
                (t, v) for t, v, s in zip(ts_us, vals, sents)
                if not s and t < start_us - gap_us
            ]
            if early:
                e_start = e_last = early[0][0]
                e_n, e_total = 0, 0
                for t, v in early:
                    if t - e_last > gap_us:
                        yield session_row(e_start, e_last, e_n, e_total)
                        e_start = e_last = t
                        e_n, e_total = 0, 0
                    e_last = t
                    e_n += 1
                    if v is not None and v == v:
                        e_total += _micro(v)
                yield session_row(e_start, e_last, e_n, e_total)
                remaining = [
                    (t, v, s) for t, v, s in zip(ts_us, vals, sents)
                    if s or t >= start_us - gap_us
                ]
            else:
                remaining = list(zip(ts_us, vals, sents))
        else:
            start_us = last_us = 0
            n, total = 0, 0
            remaining = list(zip(ts_us, vals, sents))

        for t, v, is_sent in remaining:
            if is_sent:
                # end-of-stream marker: flush the open session, do not
                # count the sentinel itself
                if has_open and n > 0:
                    yield session_row(start_us, last_us, n, total)
                has_open = False
                continue
            if not has_open:
                start_us = last_us = t
                n, total = 0, 0
                has_open = True
            elif t - last_us > gap_us:
                yield session_row(start_us, last_us, n, total)
                start_us = last_us = t
                n, total = 0, 0
            # max/min, not assignment: a LATE event within gap of the
            # open session (allowed while the watermark lags) must not
            # REWIND the session end — that would split the session on
            # the next on-time event and set the timeout too early
            last_us = max(last_us, t)
            start_us = min(start_us, t)
            n += 1
            if v is not None and v == v:  # SUM ignores NULL/NaN
                total += _micro(v)

        if has_open:
            state.update((start_us, last_us, n, total))
            # event-time timeout: fires when the WATERMARK (not wall
            # clock) passes last event + gap — the session-close
            # condition.  Clamped to wm+1: when this batch held only
            # very-late rows for the key, the watermark may already be
            # past last+gap, and a timeout timestamp <= watermark is
            # rejected by the engine; wm+1 closes the session at the
            # next micro-batch instead.
            to_ms = (last_us + gap_us) // 1000
            state.setTimeoutTimestamp(max(to_ms, state.getCurrentWatermarkMs() + 1))
        elif state.exists:
            state.remove()

    return _sessionize


def sessionize_with_timeout(stream: DataFrame,
                            gap_seconds: int = 600,
                            flush_on_sentinel: bool = False) -> DataFrame:
    """Custom stateful sessionization (the operator Spark's built-in
    ``session_window`` expresses declaratively — here via arbitrary
    state to demonstrate the full API: custom transition logic,
    emit-on-close, and ``GroupStateTimeout.EventTimeTimeout`` state
    eviction for keys that go quiet).  ``stream`` must carry a
    watermark on ``ts``; state per user is a single open-session tuple
    (start, last, n, total) — constant bytes per key at any stream
    length, the bounded-state requirement of an unbounded 100 TB
    stream.

    ``flush_on_sentinel=True`` additionally expects a boolean
    ``sentinel`` column: a sentinel row closes the key's open session
    without being counted — the end-of-replay flush that makes the
    full output equal the batch gaps-and-islands twin (see
    ``queries.streaming.stream_sessionize_final``)."""
    cols = ["user_id", "ts", "value"]
    if flush_on_sentinel:
        cols.append("sentinel")
    return (
        stream.select(*cols)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_seconds, sentinel=flush_on_sentinel),
            outputStructType=SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
