"""Multi-micro-batch streaming semantics: watermark progression across
batches, append-mode window emission, and state-bounded dedup.

The single-file tests in test_streaming.py run one micro-batch (no
watermark movement); here events are split into 8 time-ordered files
written with increasing mtimes so the file source replays them as 8
ordered micro-batches — the watermark actually advances, windows
actually close.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from cassandra_join_library_spark.functions.scalars import dsum
from cassandra_join_library_spark.sources.catalog import load_events
from cassandra_join_library_spark.streaming import windows as W

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def staged_dir(spark, tmp_path_factory):
    """Events as 8 sequential time-range files with increasing mtime."""
    base = tmp_path_factory.mktemp("events_staged")
    e = load_events(spark, SF_SMOKE).orderBy("ts")
    rows = e.count()
    bounds = e.selectExpr(
        *[f"percentile(cast(ts as double), {i/8}) as p{i}" for i in range(1, 8)]
    ).collect()[0]
    edges = [float("-inf")] + [bounds[f"p{i}"] for i in range(1, 8)] + [float("inf")]
    for i in range(8):
        lo, hi = edges[i], edges[i + 1]
        part = e.filter(
            (F.col("ts").cast("double") > lo) & (F.col("ts").cast("double") <= hi)
        )
        part.coalesce(1).write.mode("overwrite").parquet(str(base / f"chunk_{i}"))
        time.sleep(0.05)  # strictly increasing mtimes -> ordered replay
    # flatten: file source wants one directory of files
    flat = base / "flat"
    os.makedirs(flat)
    for i in range(8):
        src = next(
            p for p in os.listdir(base / f"chunk_{i}") if p.endswith(".parquet")
        )
        os.rename(base / f"chunk_{i}" / src, flat / f"{i:02d}.parquet")
        os.utime(flat / f"{i:02d}.parquet", (time.time() + i, time.time() + i))
    assert rows == spark.read.parquet(str(flat)).count()
    return str(flat)


def _stream(spark, staged_dir):
    schema = spark.read.parquet(staged_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dir)
    )


def test_append_mode_emits_closed_windows_across_batches(spark, staged_dir):
    agg = (
        _stream(spark, staged_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "v"))
        .select(F.unix_timestamp("w.start").cast("bigint").alias("ws"), "n", "v")
    )
    name, q = W.run_to_memory(agg, output_mode="append")
    got = {r["ws"]: (r["n"], r["v"]) for r in spark.table(name).collect()}
    assert got, "append mode emitted nothing — watermark never advanced"

    batch = (
        spark.read.parquet(staged_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "v"))
        .select(F.unix_timestamp("w.start").cast("bigint").alias("ws"), "n", "v")
    )
    want = {r["ws"]: (r["n"], r["v"]) for r in batch.collect()}
    # every emitted (closed) window must match the batch result exactly;
    # only trailing windows newer than the final watermark may be absent
    for ws, nv in got.items():
        assert want[ws] == nv, f"window {ws}: stream {nv} != batch {want[ws]}"
    missing = set(want) - set(got)
    if missing:
        assert min(missing) > max(got), (
            "only the newest (still-open) windows may be unemitted; "
            f"missing={sorted(missing)} emitted_max={max(got)}"
        )


def test_dedup_within_watermark_across_batches(spark, staged_dir):
    dd = (
        _stream(spark, staged_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("event_id", "user_id", "event_type")
    )
    name, q = W.run_to_memory(dd, output_mode="append")
    got = spark.table(name)
    # within-watermark dedup across ordered batches can re-emit a key
    # after its state expires, so output >= global distinct but every
    # (user, type) pair must appear
    distinct_pairs = (
        spark.read.parquet(staged_dir).select("user_id", "event_type").distinct().count()
    )
    assert got.select("user_id", "event_type").distinct().count() == distinct_pairs
    assert got.count() >= distinct_pairs
