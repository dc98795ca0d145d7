"""Incremental view maintenance: refresh == recompute, including
group birth (delta-only group) and death (fully retracted group)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_join_library_spark.operators.ivm import (
    aggregate_view, delta_aggregate, refresh_view,
)


def _rows(df):
    return {r["g"]: (r["n_rows"], float(r["total"])) for r in df.collect()}


def test_refresh_equals_recompute_with_birth_and_death(spark):
    base = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", 10.0), ("c", 0.25)],
        "g string, v double",
    )
    changes = spark.createDataFrame(
        [
            ("a", 4.0, "I"),    # grow existing group
            ("b", 10.0, "D"),   # retract b's only row -> group dies
            ("d", 7.75, "I"),   # brand-new group is born
            ("c", 0.25, "D"),   # kill c...
            ("c", 9.0, "I"),    # ...and re-create it in the same delta
        ],
        "g string, v double, op string",
    )

    view = aggregate_view(base, ["g"], "v")
    refreshed = refresh_view(
        view, delta_aggregate(changes, ["g"], "v"), ["g"])

    applied = base.exceptAll(
        changes.filter("op = 'D'").select("g", "v")
    ).unionByName(changes.filter("op != 'D'").select("g", "v"))
    recomputed = aggregate_view(applied, ["g"], "v")

    got, want = _rows(refreshed), _rows(recomputed)
    assert got == want
    assert "b" not in got          # death
    assert got["d"] == (1, 7.75)   # birth
    assert got["c"] == (1, 9.0)    # death + rebirth in one delta
    assert got["a"] == (3, 8.0)
