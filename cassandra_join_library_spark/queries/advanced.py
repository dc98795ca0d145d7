"""Advanced relational surface: semi/anti joins, full-SQL passthrough
(Catalyst is the engine's SQL front end), pivot, exact percentiles.

The SQL-passthrough queries register the catalog tables as temp views
and run ``spark.sql`` — showing a reference user can bring whole ANSI
queries, not just the fluent façade; the same text (modulo dialect)
runs on DuckDB as the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.executor import JoinExecutor
from ..plans.table_info import TableInfo
from ..registry import register
from ..sources.catalog import load_table
from ..sources.catalog import ensure_session_confs


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _view(spark, sf_dir, name):
    df = _t(spark, sf_dir, name)
    df.createOrReplaceTempView(name)
    return df


@register("join_semi", oracle="""
SELECT c.c_custkey AS customer_c_custkey, c.c_name AS customer_c_name,
       c.c_acctbal AS customer_c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def join_semi(spark, sf_dir):
    """Left-semi join via the façade: customers that have orders."""
    return (
        JoinExecutor(spark, sf_dir)
        .semiJoin(TableInfo("customer", "c_custkey"), TableInfo("orders", "o_custkey"))
        .select("customer", {"c_custkey", "c_name", "c_acctbal"})
        .execute()
    )


@register("join_anti", oracle="""
SELECT c.c_custkey AS customer_c_custkey, c.c_name AS customer_c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def join_anti(spark, sf_dir):
    """Left-anti join via the façade: customers with no orders."""
    return (
        JoinExecutor(spark, sf_dir)
        .antiJoin(TableInfo("customer", "c_custkey"), TableInfo("orders", "o_custkey"))
        .select("customer", {"c_custkey", "c_name"})
        .execute()
    )


_Q3ISH = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, year(o_orderdate), o_orderpriority
"""


@register("sql_q3_shipping_priority", oracle=_Q3ISH)
def sql_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped query through the full-SQL front end (spark.sql
    on registered views) — identical text runs on DuckDB."""
    for t in ("customer", "orders", "lineitem"):
        _view(spark, sf_dir, t)
    return spark.sql(_Q3ISH)


_Q5ISH = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@register("sql_q5_local_volume", oracle=_Q5ISH)
def sql_q5_local_volume(spark, sf_dir):
    """TPC-H Q5-shaped 6-table join pipeline through spark.sql."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        _view(spark, sf_dir, t)
    return spark.sql(_Q5ISH)


@register("pivot_status_by_year", oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS status_F,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS status_O,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS status_P
FROM orders
GROUP BY 1
""")
def pivot_status_by_year(spark, sf_dir):
    """Pivot (explicit value list for a deterministic schema — at scale
    never let pivot infer its columns with an extra pass)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"))
        .select(
            "order_year",
            F.col("F").alias("status_F"),
            F.col("O").alias("status_O"),
            F.col("P").alias("status_P"),
        )
    )


@register("percentiles_exact", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem
GROUP BY l_returnflag
""")
def percentiles_exact(spark, sf_dir):
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, both 1-based linear interpolation)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias("p99"),
    )


@register("approx_distinct_parts")  # approximate (HLL) -> rows-only check
def approx_distinct_parts(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the 100 TB cardinality
    path; approximate by design, so no SQL oracle (exact twin:
    agg_count_distinct)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )


@register("approx_distinct_mergeable")  # sketch bytes -> rows-only check
def approx_distinct_mergeable(spark, sf_dir):
    """Mergeable-sketch rollup: a Datasketches HLL sketch is built per
    (returnflag, ship-month) cell with ``hll_sketch_agg``, then the
    monthly sketches are UNIONED per flag with ``hll_union_agg`` and
    estimated — distinct-count rollup WITHOUT rescanning raw data (the
    same partial-reaggregation contract as events_rollup_daily, but
    for a non-additive measure).  At 100 TB the fine-grained sketches
    are small (lgK=12 -> ~2.5 KB each) and persistable; coarser
    rollups are sketch unions, not scans.  Estimate accuracy vs exact
    distinct is bounded in
    tests/test_executor.py::test_hll_mergeable_rollup_accuracy."""
    l = _t(spark, sf_dir, "lineitem")
    monthly = l.groupBy(
        "l_returnflag", F.date_trunc("month", "l_shipdate").alias("month")
    ).agg(F.hll_sketch_agg("l_partkey", F.lit(12)).alias("sketch"))
    return (
        monthly.groupBy("l_returnflag")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_parts"),
            F.count(F.lit(1)).alias("n_months"),
        )
    )


@register("approx_percentiles")  # approximate (KLL/GK sketch) -> rows-only
def approx_percentiles(spark, sf_dir):
    """approx_percentile (quantile sketch) per return flag — the
    100 TB quantile path: the sketch merges associatively across
    partitions (one partial-agg shuffle, constant-size state) where
    exact percentiles need a full sort.  Approximate by design → no
    SQL oracle (exact twin: percentiles_exact); max absolute rank
    error vs the exact quantile is bounded in
    tests/test_executor.py::test_approx_percentiles_within_accuracy.
    The sketch returns an array; it is unpacked to one scalar column
    per percentile so downstream consumers (and the driver's
    row-canonicalizer, which cannot sort array cells) see a flat
    schema."""
    l = _t(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx(
        "l_extendedprice", [0.25, 0.5, 0.75, 0.95], 10000
    )
    return l.groupBy("l_returnflag").agg(
        pcts[0].alias("p25"),
        pcts[1].alias("p50"),
        pcts[2].alias("p75"),
        pcts[3].alias("p95"),
    )


_Q6ISH = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


@register("sql_q6_forecast_revenue", oracle=_Q6ISH)
def sql_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6-shaped scan-heavy filter+aggregate (no joins): the
    pushdown showcase — every predicate reaches the parquet scan."""
    _view(spark, sf_dir, "lineitem")
    return spark.sql(_Q6ISH)


_Q10ISH = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
"""


@register("sql_q10_returned_items", oracle=_Q10ISH)
def sql_q10_returned_items(spark, sf_dir):
    """TPC-H Q10-shaped returned-item revenue (4-table join + agg)."""
    for t in ("customer", "orders", "lineitem", "nation"):
        _view(spark, sf_dir, t)
    return spark.sql(_Q10ISH)


_Q18ISH = """
SELECT c_custkey, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
)
GROUP BY c_custkey, o_orderkey, o_totalprice
"""


@register("sql_q18_large_orders", oracle=_Q18ISH)
def sql_q18_large_orders(spark, sf_dir):
    """TPC-H Q18-shaped large-volume orders: IN-subquery (planned as a
    semi join) + HAVING over a grouped aggregate."""
    for t in ("customer", "orders", "lineitem"):
        _view(spark, sf_dir, t)
    return spark.sql(_Q18ISH)


_Q4ISH = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("sql_q4_order_priority", oracle=_Q4ISH)
def sql_q4_order_priority(spark, sf_dir):
    """TPC-H Q4-shaped: CORRELATED EXISTS subquery — Catalyst
    decorrelates it into a left-semi join."""
    for t in ("orders", "lineitem"):
        _view(spark, sf_dir, t)
    return spark.sql(_Q4ISH)


_Q16ISH = """
SELECT p_brand, p_type,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand != 'Brand#1'
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 500.0
  )
GROUP BY p_brand, p_type
"""


@register("sql_q16_supplier_variety", oracle=_Q16ISH)
def sql_q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16-shaped: NOT IN subquery (null-aware anti join) +
    distinct aggregation."""
    for t in ("lineitem", "part", "supplier"):
        _view(spark, sf_dir, t)
    return spark.sql(_Q16ISH)


_Q2ISH = """
SELECT p.p_partkey, p.p_name, p.p_type, p.p_retailprice
FROM part p
WHERE p.p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
"""


@register("sql_q2_min_cost", oracle=_Q2ISH)
def sql_q2_min_cost(spark, sf_dir):
    """TPC-H Q2-shaped: CORRELATED SCALAR subquery (cheapest part per
    type) — Catalyst decorrelates into an aggregate + join."""
    _view(spark, sf_dir, "part")
    return spark.sql(_Q2ISH)
