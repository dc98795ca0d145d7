"""Accuracy + determinism tests for the portable sketches (parity is
covered by the oracle gate; these bound estimation error vs exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_join_library_spark.operators.sketch import (
    kmv_distinct,
    sampled_percentiles,
)
from cassandra_join_library_spark.sources.catalog import (
    load_events,
    load_table,
)

from .conftest import SF_ORACLE


def test_kmv_within_rsd_of_exact(spark):
    """k=256 → ~6% relative error; assert within 3σ (20%)."""
    l = load_table(spark, SF_ORACLE, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in l.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    est = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in kmv_distinct(l, "l_returnflag", "l_partkey", k=256).collect()
    }
    assert est.keys() == exact.keys()
    for flag, n in exact.items():
        assert abs(est[flag] - n) / n < 0.20, (flag, est[flag], n)


def test_kmv_exact_below_k(spark):
    """Groups with fewer than k distinct values report the exact count."""
    l = load_table(spark, SF_ORACLE, "lineitem")
    out = kmv_distinct(l, "l_returnflag", "l_partkey", k=100_000).collect()
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    for r in out:
        assert r["approx_distinct"] == float(exact[r["l_returnflag"]])


def test_kmv_stable_under_repartition(spark):
    l = load_table(spark, SF_ORACLE, "lineitem")
    a = sorted(map(tuple, kmv_distinct(l, "l_returnflag", "l_partkey").collect()))
    b = sorted(map(tuple, kmv_distinct(
        l.repartition(17), "l_returnflag", "l_partkey").collect()))
    assert a == b


def test_sampled_percentiles_close_to_exact(spark):
    ev = load_events(spark, SF_ORACLE).select(
        "event_id", "event_type", "value"
    )
    exact = {
        r["event_type"]: r["p50"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile(F.col("value"), F.lit(0.5)).alias("p50"))
        .collect()
    }
    approx = {
        r["event_type"]: r
        for r in sampled_percentiles(
            ev, "event_type", "value", "event_id", rate=8
        ).collect()
    }
    spread = ev.agg(
        (F.max("value") - F.min("value")).alias("s")
    ).collect()[0]["s"]
    assert approx.keys() == exact.keys()
    for t, p50 in exact.items():
        # 1/8 sample of ~400 rows/group: generous bound, scale-free
        assert abs(approx[t]["p50"] - p50) <= 0.15 * spread, (t, approx[t]["p50"], p50)
        assert approx[t]["n_sampled"] > 0
        assert approx[t]["p50"] <= approx[t]["p90"] <= approx[t]["p99"]
