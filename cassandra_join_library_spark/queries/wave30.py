"""Round-11 fourth wave: the log-bin quantile sketch — third member
of the portable mergeable-sketch family (HLL -> distinct count,
CMS -> heavy hitters, log bins -> quantiles), with the shard-merge
proof embedded the way approx_distinct_hll_merge proved MAX-merge.

Extension surface (SURVEY.md §2.6); exact-value DuckDB oracle (the
sketch state and the bracketed quantiles are integers, so the sketch
ITSELF is value-graded, not an approximation of it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sketch import logbin_quantiles, logbin_table
from ..registry import register
from ..sources.catalog import load_table

#: o_totalprice in exact integer cents on BOTH engines (DECIMAL cast
#: first — binning raw doubles would let a ulp flip a bin boundary)
_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register("approx_quantile_logbins", oracle=f"""
WITH cents AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         o_orderkey
  FROM orders
), bins AS (
  SELECT CAST(length(bin(c)) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cents GROUP BY 1
), shard AS (
  SELECT o_orderkey % 4 AS sh, CAST(length(bin(c)) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cents GROUP BY 1, 2
), merged AS (
  SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM shard GROUP BY 1
), mism AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_mismatch
  FROM bins b FULL OUTER JOIN merged m USING (bin)
  WHERE COALESCE(b.cnt, -1) != COALESCE(m.cnt, -1)
), cum AS (
  SELECT bin, cnt,
         CAST(SUM(cnt) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum
  FROM merged
), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM merged),
spec AS (
  SELECT q_pct, n, CAST((q_pct * n + 99) // 100 AS BIGINT)
           AS target_rank
  FROM (SELECT unnest([50, 90, 99]::BIGINT[]) AS q_pct), tot
), hit AS (
  SELECT s.q_pct, s.n, s.target_rank,
         CAST(MIN(c.bin) AS BIGINT) AS bin
  FROM spec s JOIN cum c ON c.cum >= s.target_rank
  GROUP BY 1, 2, 3
)
SELECT h.q_pct, h.n, h.target_rank, h.bin,
       CAST(1::BIGINT << CAST(h.bin - 1 AS INT) AS BIGINT) AS bin_lo,
       -- bin = 63 (values >= 2^62): 1<<63 overflows BIGINT on both
       -- engines; the top bin's true upper bound is BIGINT max
       CAST(CASE WHEN h.bin >= 63 THEN 9223372036854775807
                 ELSE (1::BIGINT << CAST(h.bin AS INT)) - 1 END
         AS BIGINT) AS bin_hi,
       (SELECT n_mismatch FROM mism) = 0 AS shards_match
FROM hit h
""")
def approx_quantile_logbins(spark, sf_dir):
    """P50/P90/P99 of order totals from a 64-row mergeable log-bin
    sketch (operators/sketch.py logbin_table / logbin_quantiles),
    built BY merging four orderkey-shards and proved equal to the
    single-pass table (shards_match) — the SUM-merge algebra audit the
    HLL (MAX) and CMS (SUM) sketches already carry.  Each quantile is
    bracketed within one power of two at ~512 bytes of state: the
    monitoring-rollup accuracy/state trade at 100 TB, where the exact
    path (profile_equidepth_price) costs a value-domain shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(F.expr(_CENTS).alias("c"),
                          (F.col("o_orderkey") % 4).alias("sh"))
    # TWO passes over orders total (global + one sharded build via
    # the shard= hook — filtering per shard re-scanned orders 4x),
    # and both bin tables are <= 64 (x4) rows: materialize them so
    # the quantile read-out's multiple consumers (cumulative window,
    # total, mismatch join) never re-derive from the base table —
    # the first cut's final plan scanned orders 13x
    global_bins = logbin_table(cents, "c").localCheckpoint(eager=True)
    merged = (logbin_table(cents, "c", shard=F.col("sh"))
              .groupBy("bin")
              .agg(F.sum("cnt").cast("bigint").alias("cnt"))
              .localCheckpoint(eager=True))
    mism = (global_bins.withColumnRenamed("cnt", "g")
            .join(merged.withColumnRenamed("cnt", "m"), "bin",
                  "full_outer")
            .filter(F.coalesce("g", F.lit(-1))
                    != F.coalesce("m", F.lit(-1)))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_mismatch")))
    q = logbin_quantiles(merged, [50, 90, 99])
    return (q.crossJoin(F.broadcast(mism))
            .select("q_pct", "n", "target_rank", "bin", "bin_lo",
                    "bin_hi", (F.col("n_mismatch") == 0)
                    .alias("shards_match")))
