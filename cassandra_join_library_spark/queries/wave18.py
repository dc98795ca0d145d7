"""Round-9 fifth wave: a streaming HyperLogLog whose FINAL register
state is value-oracled, and the pivot (wide conditional-aggregate)
surface.

All extension surface (SURVEY.md §2.6); exact-value DuckDB oracles
under the repo parity conventions."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sketch import hll_register_table, hll_registers_sql, hll_rollup
from ..registry import register
from ..sources.catalog import load_events
from ..streaming import windows as W

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register("stream_hll_final", oracle=f"""
SELECT grp AS event_type, n_buckets_hit, n_zero_registers, s2, est_raw
FROM ({hll_registers_sql("events", "event_type", "user_id")})
""")
def stream_hll_final(spark, sf_dir):
    """POST-ALL-BATCHES HyperLogLog register state, built BY the
    streaming engine: the (group, bucket) MAX aggregate runs as a
    Structured Streaming aggregation (complete mode, AvailableNow),
    and because HLL registers merge by MAX, the final streaming state
    equals the batch register table bit-for-bit regardless of how the
    micro-batches sliced the input — the sketch-mergeability property
    (approx_distinct_hll_merge) carried over to incremental
    execution, which is exactly how a 100 TB streaming distinct-count
    dashboard stays exact-in-expectation with O(m) state per group.
    The register rollup (exact harmonic sum, raw estimate) happens on
    the final state; the whole estimate is value-oracled against the
    one-shot batch SQL."""
    stream = W.read_events_stream(spark, sf_dir)
    regs = hll_register_table(stream, "event_type", "user_id")
    name, _ = W.run_to_memory(regs, output_mode="complete")
    return (hll_rollup(spark.table(name))
            .select(F.col("grp").alias("event_type"), "n_buckets_hit",
                    "n_zero_registers", "s2", "est_raw"))


@register("events_pivot_daily_types", oracle=f"""
SELECT CAST(epoch(CAST(ts AS DATE)) AS BIGINT) AS day_epoch,
       {", ".join(
           f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
           for t in _EVENT_TYPES)}
FROM events
GROUP BY 1
""")
def events_pivot_daily_types(spark, sf_dir):
    """Daily event-type matrix via the DataFrame PIVOT surface — the
    wide-format read behind ops dashboards.  The pivot value list is
    EXPLICIT (the bounded type domain): an unlisted pivot forces an
    extra distinct-values job and non-deterministic column order, the
    classic pivot-at-scale mistake.  Compiles to one conditional
    aggregate pass (identical to the oracle's FILTER form) — grouped
    by day, map-side combined."""
    ev = load_events(spark, sf_dir)
    out = (
        ev.groupBy(F.unix_timestamp(F.col("ts").cast("date"))
                   .cast("bigint").alias("day_epoch"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "day_epoch",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t)
          for t in _EVENT_TYPES],
    )
