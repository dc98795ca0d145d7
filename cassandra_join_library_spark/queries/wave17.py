"""Round-9 fourth wave: portable HyperLogLog with a full value oracle,
an HLL shard-merge audit, and the average-neighbor-degree curve.

All extension surface (SURVEY.md §2.6); exact-value DuckDB oracles
under the repo parity conventions."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sketch import (
    hll_register_table,
    hll_registers,
    hll_registers_sql,
)
from ..registry import register
from ..sources.catalog import load_events
from .wave4 import _EDGE_CTE, _copurchase_edges
from .wave9 import _rdiv_sql
from ..operators.stats import _RDIV


@register("approx_distinct_hll_portable", oracle=f"""
WITH hll AS ({hll_registers_sql("events", "event_type", "user_id")}),
exact AS (
  SELECT event_type AS grp,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
)
SELECT hll.grp AS event_type, n_buckets_hit, n_zero_registers, s2,
       est_raw, n_exact
FROM hll JOIN exact ON exact.grp = hll.grp
""")
def approx_distinct_hll_portable(spark, sf_dir):
    """Distinct users per event type via PORTABLE HyperLogLog
    (operators/sketch.py hll_registers): md5-derived 60-bit hashes,
    64 registers, and an EXACT-integer harmonic sum (S2 = sum of
    2^(55-M_j), a BIGINT) so the raw estimate itself — not just a row
    count — is value-oracled; the native `approx_count_distinct`
    stays the production path (approx_distinct_parts) but is
    engine-internal and rows-only by necessity.  One (group, bucket)
    MAX aggregate, map-side combined; the exact distinct count rides
    along as the audit column."""
    ev = load_events(spark, sf_dir)
    hll = hll_registers(ev, "event_type", "user_id")
    exact = (ev.groupBy(F.col("event_type").alias("grp"))
             .agg(F.countDistinct("user_id").cast("bigint")
                  .alias("n_exact")))
    return (hll.join(exact, "grp")
            .select(F.col("grp").alias("event_type"), "n_buckets_hit",
                    "n_zero_registers", "s2", "est_raw", "n_exact"))


@register("approx_distinct_hll_merge", oracle=f"""
WITH hashed AS (
  SELECT event_type AS grp, user_id % 2 AS shard,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM events
), ranked AS (
  SELECT grp, shard, h % 64 AS j,
         CASE WHEN h // 64 = 0 THEN 55
              ELSE 55 - length(bin(h // 64)) END AS r
  FROM hashed
), shard_regs AS (
  SELECT grp, shard, j, MAX(r) AS m_j FROM ranked GROUP BY 1, 2, 3
), merged AS (
  SELECT grp, j, MAX(m_j) AS m_j FROM shard_regs GROUP BY 1, 2
), global_regs AS (
  SELECT grp, j, MAX(r) AS m_j FROM ranked GROUP BY 1, 2
), roll AS (
  SELECT m.grp,
         CAST(SUM(CAST(2 ** (55 - m.m_j) AS BIGINT))
              + (64 - COUNT(*)) * {1 << 55} AS BIGINT) AS s2_merged
  FROM merged m GROUP BY 1
), roll_g AS (
  SELECT g.grp,
         CAST(SUM(CAST(2 ** (55 - g.m_j) AS BIGINT))
              + (64 - COUNT(*)) * {1 << 55} AS BIGINT) AS s2_global
  FROM global_regs g GROUP BY 1
)
SELECT roll.grp AS event_type, s2_merged, s2_global,
       s2_merged = s2_global AS merged_equal
FROM roll JOIN roll_g ON roll_g.grp = roll.grp
""")
def approx_distinct_hll_merge(spark, sf_dir):
    """The property that makes HLL THE 100 TB distinct sketch, proved
    in-query: register tables computed independently over two
    disjoint shards (user_id parity) and merged by per-bucket MAX
    yield the IDENTICAL harmonic sum as the single global pass —
    ``merged_equal`` is graded true for every group.  At cluster
    scale this is the map-side combine / executor-merge path;
    correctness of the merge is what lets the sketch cross shuffle
    and even engine boundaries."""
    ev = load_events(spark, sf_dir)
    shard0 = ev.filter(F.col("user_id") % 2 == 0)
    shard1 = ev.filter(F.col("user_id") % 2 == 1)
    r0 = hll_register_table(shard0, "event_type", "user_id")
    r1 = hll_register_table(shard1, "event_type", "user_id")
    merged_regs = (
        r0.select("grp", "j", F.col("m_j").alias("m0"))
        .join(r1.select("grp", "j", F.col("m_j").alias("m1")),
              ["grp", "j"], "full_outer")
        .select("grp", "j",
                F.greatest(F.coalesce("m0", F.lit(0)),
                           F.coalesce("m1", F.lit(0))).alias("m_j"))
    )

    def roll(regs, name):
        zero_term = F.lit(1 << 55).cast("bigint")
        return regs.groupBy("grp").agg(
            (F.sum(F.pow(F.lit(2).cast("bigint"),
                         55 - F.col("m_j")).cast("bigint"))
             + (F.lit(64) - F.count(F.lit(1))) * zero_term)
            .cast("bigint").alias(name))

    merged = roll(merged_regs, "s2_merged")
    glob = roll(hll_register_table(ev, "event_type", "user_id"),
                "s2_global")
    return (merged.join(glob, "grp")
            .select(F.col("grp").alias("event_type"), "s2_merged",
                    "s2_global",
                    (F.col("s2_merged") == F.col("s2_global"))
                    .alias("merged_equal")))


@register("graph_knn_degree_curve", oracle=f"""
WITH {_EDGE_CTE},
ed AS (
  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
), deg AS (
  SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY 1
), nbr AS (
  SELECT ed.u AS n, dn.d AS nd
  FROM ed JOIN deg dn ON dn.n = ed.v
), per_node AS (
  SELECT n, CAST(SUM(nd) AS BIGINT) AS snd FROM nbr GROUP BY 1
)
SELECT deg.d AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(per_node.snd) AS BIGINT) AS sum_neighbor_deg,
       CAST({_rdiv_sql("1000000 * SUM(per_node.snd)",
                       "deg.d * COUNT(*)")} AS BIGINT) AS knn_micro
FROM per_node JOIN deg ON deg.n = per_node.n
GROUP BY deg.d
""")
def graph_knn_degree_curve(spark, sf_dir):
    """Average neighbor degree by degree class — knn(k), the degree-
    correlation curve behind the assortativity scalar
    (graph_assortativity): decreasing knn(k) = hubs attach to
    low-degree nodes (disassortative, typical of co-occurrence
    graphs).  Two node-keyed equi-joins + bounded aggregates (the
    curve has one row per distinct degree); the rounded-micro ratio
    keeps parity integer-exact.  Never materializes anything larger
    than the directed edge list."""
    e = _copurchase_edges(spark, sf_dir)
    ed = (e.select("u", "v")
          .unionAll(e.select(F.col("v").alias("u"),
                             F.col("u").alias("v"))))
    deg = ed.groupBy(F.col("u").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d"))
    nbr = (ed.join(deg.select(F.col("n").alias("v"),
                              F.col("d").alias("nd")), "v")
           .groupBy(F.col("u").alias("n"))
           .agg(F.sum("nd").cast("bigint").alias("snd")))
    return (
        nbr.join(deg, "n")
        .groupBy(F.col("d").alias("degree"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
             F.sum("snd").cast("bigint").alias("sum_neighbor_deg"))
        .select("degree", "n_nodes", "sum_neighbor_deg",
                F.expr(_RDIV.format(
                    a="1000000 * sum_neighbor_deg",
                    b="degree * n_nodes")).cast("bigint")
                .alias("knn_micro"))
    )
