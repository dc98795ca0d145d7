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


def test_asof_forward_tolerance_and_null_ts_left(spark):
    """Forward direction picks the EARLIEST at-or-after row; the
    tolerance nulls matches beyond the bound; a NULL-ts left row must
    stay unmatched (forward's DESC ordering would otherwise hand it
    the earliest right row)."""
    from cassandra_join_library_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 10:00:00"),
         (2, 7, "2024-01-01 12:00:00"),
         (3, 7, None)],
        "lid bigint, user_id bigint, ts string",
    ).selectExpr("lid", "user_id", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [(100, 7, "2024-01-01 10:10:00"),
         (101, 7, "2024-01-01 10:20:00"),
         (102, 7, "2024-01-01 15:00:00")],
        "event_id bigint, user_id bigint, ts string",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) ts")

    out = {r["lid"]: r["matched_event_id"]
           for r in asof_join(left, right, "user_id",
                              direction="forward",
                              tolerance_seconds=1800).collect()}
    assert out == {1: 100,   # earliest at-or-after, not 101
                   2: None,  # 15:00 is 3 h away > 30 min tolerance
                   3: None}  # NULL ts never matches

    no_tol = {r["lid"]: r["matched_event_id"]
              for r in asof_join(left, right, "user_id",
                                 direction="forward").collect()}
    assert no_tol == {1: 100, 2: 102, 3: None}


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas merge_asof (independent
    reference implementation), both directions, with and without
    tolerance.  Right rows sharing (key, ts) are pre-deduplicated to
    max id on BOTH sides (the operator's documented tiebreak)."""
    import numpy as np
    import pandas as pd

    from cassandra_join_library_spark.operators.asof import asof_join

    rng = np.random.RandomState(7)
    for trial in range(4):
        nl, nr = rng.randint(1, 12), rng.randint(1, 12)
        lpdf = pd.DataFrame({
            "lid": np.arange(nl),
            "user_id": rng.randint(0, 3, nl).astype("int64"),
            "ts": pd.to_datetime(rng.randint(0, 2000, nl), unit="s"),
        })
        rpdf = pd.DataFrame({
            "event_id": np.arange(100, 100 + nr),
            "user_id": rng.randint(0, 3, nr).astype("int64"),
            "ts": pd.to_datetime(rng.randint(0, 2000, nr), unit="s"),
        })
        rded = (rpdf.sort_values("event_id")
                .groupby(["user_id", "ts"], as_index=False).last())

        ldf = spark.createDataFrame(lpdf)
        rdf = spark.createDataFrame(rpdf)

        for direction in ("backward", "forward"):
            for tol in (None, 300):
                got = {r["lid"]: r["matched_event_id"]
                       for r in asof_join(
                           ldf, rdf, "user_id",
                           direction=direction,
                           tolerance_seconds=tol).collect()}
                want_df = pd.merge_asof(
                    lpdf.sort_values("ts"),
                    rded.sort_values("ts"),
                    on="ts", by="user_id", direction=direction,
                    tolerance=(pd.Timedelta(seconds=tol)
                               if tol is not None else None),
                )
                want = {
                    int(r.lid): (None if pd.isna(r.event_id)
                                 else int(r.event_id))
                    for r in want_df.itertuples()
                }
                assert got == want, (trial, direction, tol, lpdf, rpdf)


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """Randomized cross-check of asof_join_nearest against pandas
    merge_asof(direction='nearest') — independent reference for the
    either-direction match, the tolerance bound, AND the tie rule
    (equal distance prefers the backward row)."""
    import numpy as np
    import pandas as pd

    from cassandra_join_library_spark.operators.asof import asof_join_nearest

    rng = np.random.RandomState(21)
    for trial in range(4):
        nl, nr = rng.randint(1, 12), rng.randint(1, 12)
        lpdf = pd.DataFrame({
            "lid": np.arange(nl),
            "user_id": rng.randint(0, 3, nl).astype("int64"),
            "ts": pd.to_datetime(rng.randint(0, 2000, nl), unit="s"),
        })
        rpdf = pd.DataFrame({
            "event_id": np.arange(100, 100 + nr),
            "user_id": rng.randint(0, 3, nr).astype("int64"),
            "ts": pd.to_datetime(rng.randint(0, 2000, nr), unit="s"),
        })
        rded = (rpdf.sort_values("event_id")
                .groupby(["user_id", "ts"], as_index=False).last())

        ldf = spark.createDataFrame(lpdf)
        rdf = spark.createDataFrame(rpdf)

        for tol in (None, 300):
            got = {r["lid"]: r["matched_event_id"]
                   for r in asof_join_nearest(
                       ldf, rdf, "user_id",
                       tolerance_seconds=tol).collect()}
            want_df = pd.merge_asof(
                lpdf.sort_values("ts"),
                rded.sort_values("ts"),
                on="ts", by="user_id", direction="nearest",
                tolerance=(pd.Timedelta(seconds=tol)
                           if tol is not None else None),
            )
            want = {
                int(r.lid): (None if pd.isna(r.event_id)
                             else int(r.event_id))
                for r in want_df.itertuples()
            }
            assert got == want, (trial, tol, lpdf, rpdf)
