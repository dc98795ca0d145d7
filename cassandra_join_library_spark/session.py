"""SparkSession construction tuned for this engine.

The reference (cassandra_joinlib) manages its own memory budget
(0.7 x RAM, ``join_executor.py:64-66``) and hand-rolled grace-hash
spilling (``utils.py:232-286``).  On Spark all of that is native: the
unified memory manager spills, AQE re-plans joins at runtime, and the
shuffle *is* a grace hash join.  This module centralises the configs we
care about so tests / bench / driver entry all run the same way.

Scale notes (100 TB design point):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replaces the reference's static ``(avg_l+avg_r)*|L|*|R|`` estimate
  (``hash_join.py:850-866``).
- ``spark.sql.shuffle.partitions`` is a local-mode default only; on a
  real cluster AQE's coalescing makes the initial number mostly
  irrelevant as long as it is high enough.
- Arrow enabled: every Pandas-UDF hop (similarity / multimodal ops)
  moves data in Arrow batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(app_name: str = "cassandra-join-library-spark",
              master: str | None = None,
              shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries nanosecond timestamps, which the
        # vectorized reader rejects; read them as long and normalize in
        # sources.catalog.load_events
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
