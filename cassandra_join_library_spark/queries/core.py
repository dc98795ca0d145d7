"""Core façade queries — the reference's own surface (SURVEY.md §2).

Every query here goes through :class:`JoinExecutor` (not raw DataFrame
code) so the driver's oracle check exercises the façade end-to-end:
J1-J4 equi joins, J6 theta joins, J7 composite keys, J9 alias
self-join, J10 chained left-deep, P1-P3 projection, F1-F2 condition
algebra (reference anchors in each docstring).
"""

from __future__ import annotations

from ..plans.condition import Condition
from ..plans.executor import JoinExecutor
from ..plans.table_info import TableInfo
from ..registry import register


@register("join_inner", oracle="""
SELECT c.c_custkey AS customer_c_custkey, c.c_name AS customer_c_name,
       c.c_nationkey AS customer_c_nationkey, c.c_acctbal AS customer_c_acctbal,
       n.n_nationkey AS nation_n_nationkey, n.n_name AS nation_n_name
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE COALESCE(c.c_acctbal > 1000, FALSE)
""")
def join_inner(spark, sf_dir):
    """J1 inner equi-join + P1 projection + F1 filter
    (reference: intermediate_result.py:126-403)."""
    return (
        JoinExecutor(spark, sf_dir)
        .join(TableInfo("customer", "c_nationkey"), TableInfo("nation", "n_nationkey"))
        .select("customer", {"c_custkey", "c_name", "c_nationkey", "c_acctbal"})
        .select("nation", {"n_nationkey", "n_name"})
        .filter_by(Condition("customer.c_acctbal", ">", 1000))
        .execute()
    )


@register("join_left", oracle="""
SELECT c.c_custkey AS customer_c_custkey, c.c_name AS customer_c_name,
       o.o_orderkey AS orders_o_orderkey, o.o_custkey AS orders_o_custkey,
       o.o_totalprice AS orders_o_totalprice
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
""")
def join_left(spark, sf_dir):
    """J2 left outer equi-join — unmatched customers NULL-padded
    (reference: intermediate_result.py:229-248)."""
    return (
        JoinExecutor(spark, sf_dir)
        .leftJoin(TableInfo("customer", "c_custkey"), TableInfo("orders", "o_custkey"))
        .select("customer", {"c_custkey", "c_name"})
        .select("orders", {"o_orderkey", "o_custkey", "o_totalprice"})
        .execute()
    )


@register("join_right", oracle="""
SELECT o.o_orderkey AS orders_o_orderkey, o.o_custkey AS orders_o_custkey,
       c.c_custkey AS customer_c_custkey, c.c_name AS customer_c_name,
       c.c_acctbal AS customer_c_acctbal
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
""")
def join_right(spark, sf_dir):
    """J3 right outer equi-join (reference: intermediate_result.py:250-269)."""
    return (
        JoinExecutor(spark, sf_dir)
        .rightJoin(TableInfo("orders", "o_custkey"), TableInfo("customer", "c_custkey"))
        .select("orders", {"o_orderkey", "o_custkey"})
        .select("customer", {"c_custkey", "c_name", "c_acctbal"})
        .execute()
    )


@register("join_full", oracle="""
SELECT s.s_suppkey AS supplier_s_suppkey, s.s_name AS supplier_s_name,
       s.s_nationkey AS supplier_s_nationkey,
       c.c_custkey AS customer_c_custkey, c.c_nationkey AS customer_c_nationkey,
       c.c_mktsegment AS customer_c_mktsegment
FROM supplier s FULL OUTER JOIN customer c ON s.s_nationkey = c.c_nationkey
""")
def join_full(spark, sf_dir):
    """J4 full outer equi-join, many-to-many key
    (reference: intermediate_result.py:271-304)."""
    return (
        JoinExecutor(spark, sf_dir)
        .fullOuterJoin(
            TableInfo("supplier", "s_nationkey"), TableInfo("customer", "c_nationkey")
        )
        .select("supplier", {"s_suppkey", "s_name", "s_nationkey"})
        .select("customer", {"c_custkey", "c_nationkey", "c_mktsegment"})
        .execute()
    )


@register("join_chain3", oracle="""
SELECT c.c_custkey AS customer_c_custkey, c.c_name AS customer_c_name,
       c.c_nationkey AS customer_c_nationkey, c.c_mktsegment AS customer_c_mktsegment,
       n.n_nationkey AS nation_n_nationkey, n.n_name AS nation_n_name,
       n.n_regionkey AS nation_n_regionkey,
       r.r_regionkey AS region_r_regionkey, r.r_name AS region_r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE (COALESCE(c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING'), FALSE)
       AND NOT COALESCE(r.r_name = 'EUROPE', FALSE))
""")
def join_chain3(spark, sf_dir):
    """J10 chained left-deep 3-table join + F1 algebra (IN, ~, &)
    (reference: hash_join.py:295-339; commands.py:100-147)."""
    return (
        JoinExecutor(spark, sf_dir)
        .join(TableInfo("customer", "c_nationkey"), TableInfo("nation", "n_nationkey"))
        .join(TableInfo("nation", "n_regionkey"), TableInfo("region", "r_regionkey"))
        .select("customer", {"c_custkey", "c_name", "c_nationkey", "c_mktsegment"})
        .select("nation", {"n_nationkey", "n_name", "n_regionkey"})
        .select("region", {"r_regionkey", "r_name"})
        .filter_by(
            Condition("customer.c_mktsegment", "IN", {"BUILDING", "AUTOMOBILE"})
            & ~Condition("region.r_name", "=", "EUROPE")
        )
        .execute()
    )


@register("join_composite", oracle="""
SELECT a.l_orderkey AS a_l_orderkey, a.l_linenumber AS a_l_linenumber,
       a.l_quantity AS a_l_quantity,
       b.l_orderkey AS b_l_orderkey, b.l_linenumber AS b_l_linenumber,
       b.l_extendedprice AS b_l_extendedprice
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
""")
def join_composite(spark, sf_dir):
    """J7 composite-key equi-join via tuple join_column
    (reference: utils.py:512-525; hash_join.py:1011-1018)."""
    return (
        JoinExecutor(spark, sf_dir)
        .join(
            TableInfo("lineitem", ("l_orderkey", "l_linenumber"), "a"),
            TableInfo("lineitem", ("l_orderkey", "l_linenumber"), "b"),
        )
        .select("a", {"l_orderkey", "l_linenumber", "l_quantity"})
        .select("b", {"l_orderkey", "l_linenumber", "l_extendedprice"})
        .execute()
    )


@register("join_self_alias", oracle="""
SELECT a.n_nationkey AS a_n_nationkey, a.n_name AS a_n_name,
       a.n_regionkey AS a_n_regionkey,
       b.n_nationkey AS b_n_nationkey, b.n_name AS b_n_name,
       b.n_regionkey AS b_n_regionkey
FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
WHERE COALESCE(a.n_nationkey < b.n_nationkey, FALSE)
""")
def join_self_alias(spark, sf_dir):
    """J9 self-join via alias; rhs of the filter is a column reference
    (reference: commands.py:44-49, operand resolution commands.py:109-147)."""
    return (
        JoinExecutor(spark, sf_dir)
        .join(TableInfo("nation", "n_regionkey", "a"), TableInfo("nation", "n_regionkey", "b"))
        .filter_by(Condition("a.n_nationkey", "<", "b.n_nationkey"))
        .execute()
    )


@register("theta_lt", oracle="""
SELECT s.s_suppkey AS supplier_s_suppkey, s.s_acctbal AS supplier_s_acctbal,
       c.c_custkey AS customer_c_custkey, c.c_acctbal AS customer_c_acctbal
FROM supplier s JOIN customer c ON s.s_acctbal < c.c_acctbal
""")
def theta_lt(spark, sf_dir):
    """J6 theta inner join with ``<`` — Catalyst plans a broadcast
    nested-loop join, the reference's block-nested-loop
    (nested_join.py:809-846) with the small side broadcast."""
    return (
        JoinExecutor(spark, sf_dir)
        .join(TableInfo("supplier", "s_acctbal"), TableInfo("customer", "c_acctbal"),
              operator="<")
        .select("supplier", {"s_suppkey", "s_acctbal"})
        .select("customer", {"c_custkey", "c_acctbal"})
        .execute()
    )


@register("theta_neq", oracle="""
SELECT n.n_nationkey AS nation_n_nationkey, n.n_regionkey AS nation_n_regionkey,
       r.r_regionkey AS region_r_regionkey, r.r_name AS region_r_name
FROM nation n JOIN region r ON n.n_regionkey != r.r_regionkey
""")
def theta_neq(spark, sf_dir):
    """J6 theta join with ``!=`` (nested_join.py:1000-1036)."""
    return (
        JoinExecutor(spark, sf_dir)
        .join(TableInfo("nation", "n_regionkey"), TableInfo("region", "r_regionkey"),
              operator="!=")
        .select("nation", {"n_nationkey", "n_regionkey"})
        .select("region", {"r_regionkey", "r_name"})
        .execute()
    )


@register("theta_left_outer", oracle="""
SELECT n.n_nationkey AS nation_n_nationkey, n.n_regionkey AS nation_n_regionkey,
       r.r_regionkey AS region_r_regionkey, r.r_name AS region_r_name
FROM nation n LEFT JOIN region r ON n.n_regionkey > r.r_regionkey
""")
def theta_left_outer(spark, sf_dir):
    """J6 theta LEFT join — unmatched left rows NULL-padded, matching
    the reference's flag-based flush (nested_join.py:1101-1153)."""
    return (
        JoinExecutor(spark, sf_dir)
        .leftJoin(TableInfo("nation", "n_regionkey"), TableInfo("region", "r_regionkey"),
                  operator=">")
        .select("nation", {"n_nationkey", "n_regionkey"})
        .select("region", {"r_regionkey", "r_name"})
        .execute()
    )


@register("theta_right_outer", oracle="""
SELECT n.n_nationkey AS nation_n_nationkey, n.n_regionkey AS nation_n_regionkey,
       r.r_regionkey AS region_r_regionkey, r.r_name AS region_r_name
FROM nation n RIGHT JOIN region r ON n.n_regionkey > r.r_regionkey
""")
def theta_right_outer(spark, sf_dir):
    """J6 theta RIGHT join — unmatched right rows NULL-padded on the
    left (reference right-outer BNLJ layout: nested_join.py:743-949);
    Spark plans BroadcastNestedLoopJoin with the stream/build sides
    arranged for the preserved (right) side."""
    return (
        JoinExecutor(spark, sf_dir)
        .rightJoin(TableInfo("nation", "n_regionkey"), TableInfo("region", "r_regionkey"),
                   operator=">")
        .select("nation", {"n_nationkey", "n_regionkey"})
        .select("region", {"r_regionkey", "r_name"})
        .execute()
    )


@register("theta_full_outer", oracle="""
SELECT n.n_nationkey AS nation_n_nationkey, n.n_regionkey AS nation_n_regionkey,
       r.r_regionkey AS region_r_regionkey, r.r_name AS region_r_name
FROM nation n FULL JOIN region r ON n.n_regionkey < r.r_regionkey
""")
def theta_full_outer(spark, sf_dir):
    """J6 theta FULL join — both sides' unmatched rows flushed
    NULL-padded (reference full-outer flag arrays:
    nested_join.py:1101-1171).  With region keys 0..4, ``<`` leaves
    the max-key nations AND region 0 unmatched, so both flush paths
    are genuinely exercised rather than degenerating to inner rows."""
    return (
        JoinExecutor(spark, sf_dir)
        .fullOuterJoin(TableInfo("nation", "n_regionkey"),
                       TableInfo("region", "r_regionkey"), operator="<")
        .select("nation", {"n_nationkey", "n_regionkey"})
        .select("region", {"r_regionkey", "r_name"})
        .execute()
    )


@register("filter_algebra", oracle="""
SELECT c.c_custkey AS customer_c_custkey, c.c_name AS customer_c_name,
       c.c_mktsegment AS customer_c_mktsegment, c.c_acctbal AS customer_c_acctbal
FROM customer c
WHERE ((COALESCE(c.c_mktsegment IN ('MACHINERY', 'HOUSEHOLD'), FALSE)
        AND COALESCE(c.c_acctbal >= 5000, FALSE))
       OR NOT COALESCE(contains(c.c_name, '1'), FALSE))
""")
def filter_algebra(spark, sf_dir):
    """F1 condition algebra on a single-table scan: IN, CONTAINS,
    ``& | ~`` combinators (reference: commands.py:52-159)."""
    return (
        JoinExecutor(spark, sf_dir)
        .scan(TableInfo("customer"))
        .select("customer", {"c_custkey", "c_name", "c_mktsegment", "c_acctbal"})
        .filter_by(
            (
                Condition("customer.c_mktsegment", "IN", {"MACHINERY", "HOUSEHOLD"})
                & Condition("customer.c_acctbal", ">=", 5000)
            )
            | ~Condition("customer.c_name", "CONTAINS", "1")
        )
        .execute()
    )


@register("projection", oracle="""
SELECT p.p_partkey AS part_p_partkey, p.p_size AS part_p_size,
       p.p_retailprice AS part_p_retailprice
FROM part p WHERE COALESCE(p.p_size <= 20, FALSE)
""")
def projection(spark, sf_dir):
    """P1 projection with filter-referenced column force-added to the
    scan (reference addColumn: hash_join.py:59-89) — p_size is read for
    the filter; the parquet scan prunes all other columns."""
    return (
        JoinExecutor(spark, sf_dir)
        .scan(TableInfo("part"))
        .select("part", {"p_partkey", "p_retailprice"})
        .filter_by(Condition("part.p_size", "<=", 20))
        .execute()
    )
