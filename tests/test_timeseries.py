"""Unit invariants for operators/timeseries.py (the DuckDB oracle in
tests/test_oracle_parity.py checks events_scd2_history's exact values;
these pin the semantic contract on handcrafted edges the testdata may
not contain — null transitions, single-event keys, duplicate
timestamps)."""

from __future__ import annotations

from cassandra_join_library_spark.operators.timeseries import scd2_intervals
from cassandra_join_library_spark.sources.catalog import local_frame


def _run(spark, rows):
    df = local_frame(spark, 
        rows, "k bigint, ts timestamp, v string, id bigint"
    )
    out = scd2_intervals(df, "k", "ts", ["v"], "id")
    return sorted(
        out.collect(), key=lambda r: (r["k"], r["valid_from"], r["is_current"])
    )


def test_scd2_collapses_runs_and_stitches_intervals(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(0), "a", 0),   # version 1
        (1, t(10), "a", 1),  # same value — collapsed
        (1, t(20), "b", 2),  # version 2
        (1, t(30), "a", 3),  # back to a — NEW version (value history, not distinct)
        (2, t(5), "x", 4),   # single-event key
    ]
    got = _run(spark, rows)
    as_tuples = [
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in got
    ]
    base = 1704067200  # 2024-01-01T00:00:00Z
    assert as_tuples == [
        (1, "a", base + 0, base + 20, False),
        (1, "b", base + 20, base + 30, False),
        (1, "a", base + 30, None, True),
        (2, "x", base + 5, None, True),
    ]


def test_scd2_null_transitions_are_changes(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(0), None, 0),   # initial version with NULL value
        (1, t(10), None, 1),  # still NULL — collapsed
        (1, t(20), "a", 2),   # NULL -> a is a change
        (1, t(30), None, 3),  # a -> NULL is a change
    ]
    got = _run(spark, rows)
    assert [(r["v"], r["is_current"]) for r in got] == [
        (None, False), ("a", False), (None, True),
    ]
    # intervals must tile the key's history with no gaps or overlaps
    for prev, nxt in zip(got, got[1:]):
        assert prev["valid_to"] == nxt["valid_from"]
    assert sum(r["is_current"] for r in got) == 1
