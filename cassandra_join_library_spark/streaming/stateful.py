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
    """Double → DECIMAL(18,6)-equivalent microunits, replicating
    DuckDB's CAST(double AS DECIMAL(18,6)) bit-for-bit — DuckDB is the
    value oracle the stream-final twins are graded against, so ITS
    pipeline (not the mathematically exact quantization) is the parity
    target.

    DuckDB (1.0.0) rounds the IEEE-754 PRODUCT double ``v * 1e6`` —
    one extra rounding step vs the exact binary value, which shifts
    adversarial inputs within ~half an ulp of a .5-microunit boundary
    (e.g. -2.0000025, whose exact expansion is -2000002.49999999905
    microunits but whose product double lands exactly on -2000002.5).
    Empirically (probed over boundary patterns + the 2^24 float-
    mantissa transition) its tie rule is half-AWAY for |product| <
    2^24 and half-EVEN above; non-ties round to nearest.  ``Decimal(p)``
    is the exact value of the product double, so quantizing it with
    that tie rule reproduces DuckDB's result.  Pinned in
    ``tests/test_streaming.py::test_micro_matches_duckdb_decimal_cast_on_boundaries``
    (boundary patterns, constructed product-ties on both sides of
    2^24, 5000 random doubles) so a DuckDB rounding change surfaces as
    a loud test failure, not a silent oracle mismatch.

    CAVEAT: this replicates an empirically probed, version-specific
    behavior of DuckDB 1.0.0 (the version installed here), not a
    documented contract — a DuckDB upgrade may flip the tie rule.  The
    pinned test prints the installed ``duckdb.__version__`` on failure
    so an upgrade-induced break is immediately attributable."""
    from decimal import ROUND_HALF_EVEN, ROUND_HALF_UP, Decimal

    p = float(v) * _MICRO
    mode = ROUND_HALF_UP if abs(p) < 2 ** 24 else ROUND_HALF_EVEN
    return int(Decimal(p).quantize(0, rounding=mode))


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

        # One greedy gaps-and-islands pass over the SORTED union of the
        # open state session (as an interval item carrying its
        # aggregates) and this batch's events.  Re-evaluating the gap
        # after every merge is what the batch twin does — a frozen
        # pre-batch split point diverges when a bridging event exists:
        # an event more than gap before the OLD session start must
        # still merge if a later in-batch event chains them together.
        # Each item: (start, end, n, total_micro, is_sentinel); a
        # sentinel sorts after same-timestamp events (end-of-stream
        # flush happens last) and closes the open run without being
        # counted.
        items = []
        if state.exists:
            s0, l0, n0, tot0 = state.get
            items.append((s0, l0, n0, tot0, False))
        for t, v, is_sent in zip(ts_us, vals, sents):
            if is_sent:
                items.append((t, t, 0, 0, True))
            else:
                mv = _micro(v) if v is not None and v == v else 0
                items.append((t, t, 1, mv, False))
        items.sort(key=lambda it: (it[0], it[4]))

        cur = None  # open run: (start_us, last_us, n, total_micro)
        for start, end, cnt, tot, is_sent in items:
            if is_sent:
                if cur is not None and cur[2] > 0:
                    yield session_row(*cur)
                cur = None
                continue
            if cur is None:
                cur = (start, end, cnt, tot)
            elif start - cur[1] > gap_us:
                yield session_row(*cur)
                cur = (start, end, cnt, tot)
            else:
                # end via max(): a LATE event inside the open run must
                # not rewind the session end (that would split the
                # session on the next on-time event and set the
                # timeout too early)
                cur = (cur[0], max(cur[1], end), cur[2] + cnt, cur[3] + tot)

        if cur is not None:
            start_us, last_us, n, total = cur
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
