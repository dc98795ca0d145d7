"""Façade theta → bucketized range-join auto-rewrite.

An inner theta join (`p >= lo`) whose queued filters also bound the
point from the other side (`p <= hi`, lo/hi on one input) is a
point-in-interval containment; the executor rewrites it into an
equi-join on quantized buckets instead of a BroadcastNestedLoopJoin.
These tests pin (a) bit-identical results vs the un-rewritten plan,
(b) that the physical plan really lost its BNLJ, and (c) that the
rewrite declines every case it cannot prove safe.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_join_library_spark import (
    Condition,
    JoinExecutor,
    MemoryCatalog,
    TableInfo,
)
from cassandra_join_library_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def frames(spark):
    l = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.unix_timestamp("l_shipdate").cast("bigint").alias("ship_epoch"),
    )
    o = load_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_orderkey") % 20 == 0
    ).select(
        F.col("o_orderkey").alias("iv_key"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("lo_epoch"),
    )
    iv = o.withColumn("hi_epoch", F.col("lo_epoch") + F.lit(604800))
    return {"pts": l, "iv": iv}


def _executor(spark, frames, auto=True):
    return (
        JoinExecutor(spark, MemoryCatalog(frames), auto_range_join=auto)
        .join(TableInfo("pts", "ship_epoch"), TableInfo("iv", "lo_epoch"), ">=")
        .filter_by(Condition("pts.ship_epoch", "<=", "iv.hi_epoch"))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rewrite_fires_and_matches_bnlj_plan(spark, frames):
    ex = _executor(spark, frames, auto=True)
    fast = ex.execute()
    assert any("interval-rewrite" in n for n in ex.plan_notes)
    plan = ex.explain("formatted")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    ref = _executor(spark, frames, auto=False)
    slow = ref.execute()
    assert not ref.plan_notes
    assert "NestedLoopJoin" in ref.explain("formatted") or \
        "CartesianProduct" in ref.explain("formatted")

    assert fast.columns == slow.columns
    assert _rows(fast) == _rows(slow)
    assert fast.count() > 0


def test_rewrite_mirrored_direction_intervals_on_left(spark, frames):
    """Intervals accumulated on the LEFT side, point table joined on the
    right with `lo <= p` — reading (i) with sides swapped."""
    ex = (
        JoinExecutor(spark, MemoryCatalog(frames))
        .join(TableInfo("iv", "lo_epoch"), TableInfo("pts", "ship_epoch"), "<=")
        .filter_by(Condition("pts.ship_epoch", "<=", "iv.hi_epoch"))
    )
    fast = ex.execute()
    assert any("interval-rewrite" in n for n in ex.plan_notes)

    ref = (
        JoinExecutor(spark, MemoryCatalog(frames), auto_range_join=False)
        .join(TableInfo("iv", "lo_epoch"), TableInfo("pts", "ship_epoch"), "<=")
        .filter_by(Condition("pts.ship_epoch", "<=", "iv.hi_epoch"))
    )
    assert _rows(fast) == _rows(ref.execute())


def test_no_rewrite_without_bound_filter(spark, frames):
    ex = JoinExecutor(spark, MemoryCatalog(frames)).join(
        TableInfo("pts", "ship_epoch"), TableInfo("iv", "lo_epoch"), ">="
    )
    ex.execute()
    assert not ex.plan_notes


def test_no_rewrite_for_outer_join(spark, frames):
    ex = (
        JoinExecutor(spark, MemoryCatalog(frames))
        .leftJoin(TableInfo("pts", "ship_epoch"), TableInfo("iv", "lo_epoch"), ">=")
        .filter_by(Condition("pts.ship_epoch", "<=", "iv.hi_epoch"))
    )
    ex.execute()
    assert not ex.plan_notes


def test_no_rewrite_when_bound_is_under_or(spark, frames):
    """A bound inside an OR is not a guaranteed conjunct — must not fire."""
    cond = Condition("pts.ship_epoch", "<=", "iv.hi_epoch") | Condition(
        "pts.ship_epoch", "=", 0
    )
    ex = (
        JoinExecutor(spark, MemoryCatalog(frames))
        .join(TableInfo("pts", "ship_epoch"), TableInfo("iv", "lo_epoch"), ">=")
        .filter_by(cond)
    )
    ex.execute()
    assert not ex.plan_notes


def test_rewrite_with_anded_bound_and_extra_filter(spark, frames):
    """Bound arrives AND-ed with an unrelated predicate; both apply."""
    ex = (
        JoinExecutor(spark, MemoryCatalog(frames))
        .join(TableInfo("pts", "ship_epoch"), TableInfo("iv", "lo_epoch"), ">=")
        .filter_by(
            Condition("pts.ship_epoch", "<=", "iv.hi_epoch")
            & Condition("iv.iv_key", ">", 100)
        )
    )
    fast = ex.execute()
    assert any("interval-rewrite" in n for n in ex.plan_notes)

    ref = (
        JoinExecutor(spark, MemoryCatalog(frames), auto_range_join=False)
        .join(TableInfo("pts", "ship_epoch"), TableInfo("iv", "lo_epoch"), ">=")
        .filter_by(
            Condition("pts.ship_epoch", "<=", "iv.hi_epoch")
            & Condition("iv.iv_key", ">", 100)
        )
    )
    assert _rows(fast) == _rows(ref.execute())


def test_no_rewrite_for_non_numeric_keys(spark):
    n = load_table(spark, SF_SMOKE, "nation")
    a = n.select(F.col("n_name").alias("name_a"), F.col("n_nationkey").alias("k_a"))
    b = n.select(F.col("n_name").alias("name_b"), F.col("n_name").alias("hi_b"))
    ex = (
        JoinExecutor(spark, MemoryCatalog({"a": a, "b": b}))
        .join(TableInfo("a", "name_a"), TableInfo("b", "name_b"), ">=")
        .filter_by(Condition("a.name_a", "<=", "b.hi_b"))
    )
    ex.execute()
    assert not ex.plan_notes


def test_inverted_intervals_cannot_match(spark, frames):
    """SOME intervals inverted (hi < lo): the rewrite still fires (avg
    width positive) and its per-row hi >= lo guard drops the inverted
    rows — identical results to the un-rewritten plan."""
    bad_iv = frames["iv"].withColumn(
        "hi_epoch",
        F.when(F.col("iv_key") % 40 == 0, F.col("lo_epoch") - 1).otherwise(
            F.col("hi_epoch")
        ),
    )
    fr = {"pts": frames["pts"], "iv": bad_iv}
    fast = _executor(spark, fr, auto=True)
    slow = _executor(spark, fr, auto=False)
    assert _rows(fast.execute()) == _rows(slow.execute())
    assert any("interval-rewrite" in n for n in fast.plan_notes)


def test_all_degenerate_intervals_decline_rewrite(spark, frames):
    """EVERY interval inverted → avg width <= 0: no meaningful bucket
    width exists, so the rewrite declines (the old 1e-9 floor would
    saturate floor(p/w) to Long.max — one hot bucket) and the BNLJ
    fallback still yields the correct (empty) result."""
    bad_iv = frames["iv"].withColumn(
        "hi_epoch", F.col("lo_epoch") - 1
    )
    fr = {"pts": frames["pts"], "iv": bad_iv}
    fast = _executor(spark, fr, auto=True)
    slow = _executor(spark, fr, auto=False)
    assert _rows(fast.execute()) == _rows(slow.execute()) == []
    assert not any("interval-rewrite" in n for n in fast.plan_notes)
