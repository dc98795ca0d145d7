"""TPC-H-shaped SQL suite, batch 3: Q9/Q11/Q12/Q20/Q21 shapes —
completing 22/22 TPC-H coverage on the trimmed testdata schema.

The testdata carries no ``partsupp`` table and no
``l_shipmode/l_commitdate/l_receiptdate`` columns, so these five use
column analogues that preserve each query's PLAN SHAPE (what matters
at 100 TB), not its literal text:

- Q9: profit = revenue − cost uses ``p_retailprice·l_quantity/10``
  as the supply-cost proxy (original: ``ps_supplycost·l_quantity``).
- Q11: "inventory value" per part = lineitem revenue from suppliers
  of one nation (original: ``ps_supplycost·ps_availqty``); the
  HAVING > fraction-of-total scalar subquery is preserved.
- Q12: "late shipment" = shipped > 60 days after order date
  (original: receipt after commit); the two-way CASE count by a
  line attribute is preserved (returnflag for shipmode).
- Q20: shipped-quantity threshold per (supplier, part) replaces the
  availqty threshold; the nested IN-subquery chain is preserved.
- Q21: "kept waiting" = the unique last-shipping supplier of a
  multi-supplier finished order (original: the unique
  receipt-after-commit supplier); the correlated EXISTS +
  NOT EXISTS pair is preserved.

All run through the full-SQL front end with identical text as the
DuckDB oracle, under the repo parity conventions (exact DECIMAL money
sums cast to DOUBLE at the end, BIGINT computed integers).

Reference parity note: the reference (widyaput/Cassandra-Join-Library)
has no SQL front end at all — its surface is programmatic joins
(``cassandra_joinlib/commands.py``); the TPC-H suite is extension
surface per SURVEY.md §2.6.
"""

from __future__ import annotations

from .tpch2 import _sql

_Q9ISH = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * l.l_quantity * 0.1
                AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, year(o.o_orderdate)
"""

sql_q9_product_profit = _sql(
    "sql_q9_product_profit",
    ("lineitem", "part", "supplier", "orders", "nation"),
    _Q9ISH,
    """TPC-H Q9-shaped: product-type profit by supplier nation and
    year — 5-way star join with a substring part filter; profit uses
    the retail-price cost proxy (no partsupp in the testdata).  The
    p_name LIKE filter must reach the part scan so the fact join
    probes a pre-filtered build side.""",
)


_Q11ISH = """
WITH value_by_part AS (
  SELECT l.l_partkey AS p_key,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS part_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT p_key AS p_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM value_by_part
WHERE part_value > (
  SELECT SUM(part_value) * 0.001 FROM value_by_part
)
"""

sql_q11_important_stock = _sql(
    "sql_q11_important_stock",
    ("lineitem", "supplier", "nation"),
    _Q11ISH,
    """TPC-H Q11-shaped: parts whose one-nation revenue exceeds a
    fraction of the national total — the CTE is aggregated once and
    reused by both the outer scan and the uncorrelated scalar
    threshold subquery (original compares partsupp inventory value;
    same group-then-global-scalar plan shape).  The comparison stays
    in exact DECIMAL; only the output casts to double.""",
)


_Q12ISH = """
SELECT l.l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
"""

sql_q12_late_shipments = _sql(
    "sql_q12_late_shipments",
    ("orders", "lineitem"),
    _Q12ISH,
    """TPC-H Q12-shaped: priority mix of LATE shipments by line class —
    the late predicate (shipped >60 days after order date, standing in
    for receipt-after-commit) correlates the two join sides so it can
    only apply post-join, while the shipdate year window pushes into
    the lineitem scan; two complementary CASE counts per group.""",
)


_Q20ISH = """
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
    SELECT p.p_partkey FROM part p WHERE p.p_name LIKE 'red%'
  )
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING SUM(l.l_quantity) > 45.0
)
  AND s.s_nationkey IN (
    SELECT n.n_nationkey FROM nation n WHERE n.n_name = 'NATION_5'
  )
"""

sql_q20_potential_promotion = _sql(
    "sql_q20_potential_promotion",
    ("supplier", "lineitem", "part", "nation"),
    _Q20ISH,
    """TPC-H Q20-shaped: suppliers of 'red' parts with heavy shipped
    volume in one nation — the signature NESTED IN-subquery chain
    (supplier ← grouped lineitem ← part), each level decorrelating to
    a semi-join; the HAVING threshold stands in for the availqty
    comparison.  The part filter must prune before the fact-table
    group-by.""",
)


_Q21ISH = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN nation n    ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name = 'NATION_1'
  AND EXISTS (
    SELECT /*+ SHUFFLE_MERGE(l2) */ 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT /*+ SHUFFLE_MERGE(l3) */ 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
"""

sql_q21_waiting_suppliers = _sql(
    "sql_q21_waiting_suppliers",
    ("supplier", "lineitem", "orders", "nation"),
    _Q21ISH,
    """TPC-H Q21-shaped: suppliers who held up multi-supplier finished
    orders — kept-waiting is 'no co-supplier shipped later' (standing
    in for receipt-after-commit), preserving the correlated EXISTS
    (another supplier in the order) + NOT EXISTS (none shipped later)
    pair, which Catalyst decorrelates to a semi- and an anti-join on
    l_orderkey.  Counted per qualifying lineitem, as in the spec.

    The subqueries carry SHUFFLE_MERGE hints (comment syntax, ignored
    by the DuckDB twin): their build side is the FACT table, whose
    column-pruned compressed scan estimate can sneak under the 64 MB
    broadcast threshold long after the real hashed relation stopped
    fitting (at sf10 Spark broadcast 60 M rows: 95 s and GC thrash vs
    13 s warm with the shuffle plan; at 100 TB a fact-table broadcast
    is simply fatal).  Dimension broadcasts (supplier/orders/nation)
    stay untouched.""",
)
