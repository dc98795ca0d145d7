"""Round-9 thirteenth wave: HyperBall — the approximate neighborhood
function via HLL register propagation along edges (Boldi & Vigna),
composing the portable sketch with graph iteration.

Extension surface (SURVEY.md §2.6); exact-value DuckDB oracle under
the repo parity conventions."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sketch import HLL_M, _HLL_PAYLOAD_BITS, _h60
from ..registry import register
from .wave4 import _EDGE_CTE, _copurchase_edges


_T = 2          # propagation rounds: balls of radius 1 and 2
_ZERO_TERM = 1 << (_HLL_PAYLOAD_BITS + 1)


def _ball_roll_sql(m: str, t: int) -> str:
    return (
        f"SELECT CAST({t} AS BIGINT) AS radius,\n"
        f"       CAST(COUNT(DISTINCT n) AS BIGINT) AS n_nodes,\n"
        f"       CAST(COUNT(*) AS BIGINT) AS total_buckets_hit,\n"
        f"       CAST(CAST(SUM(CAST(2 ** ({_HLL_PAYLOAD_BITS + 1} - m) "
        f"AS DECIMAL(38,0)))\n"
        f"            + (CAST(COUNT(DISTINCT n) AS DECIMAL(38,0)) "
        f"* {HLL_M} - COUNT(*))\n"
        f"              * CAST({_ZERO_TERM} AS DECIMAL(38,0)) "
        f"AS DECIMAL(38,0)) AS VARCHAR) AS sum_s2\n"
        f"FROM {m}"
    )


@register("graph_hyperball_reach", oracle=f"""
WITH {_EDGE_CTE},
ed AS (
  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
), nodes AS (
  SELECT DISTINCT u AS n FROM ed
), h AS (
  SELECT n, ('0x' || substr(md5(CAST(n AS VARCHAR)), 1, 15))::BIGINT
           AS hv
  FROM nodes
), m0 AS (
  SELECT n, hv % {HLL_M} AS j,
         CASE WHEN hv // {HLL_M} = 0 THEN {_HLL_PAYLOAD_BITS + 1}
              ELSE {_HLL_PAYLOAD_BITS + 1}
                   - length(bin(hv // {HLL_M})) END AS m
  FROM h
), m1 AS (
  SELECT n, j, MAX(m) AS m FROM (
    SELECT n, j, m FROM m0
    UNION ALL
    SELECT ed.u AS n, r.j, r.m FROM ed JOIN m0 r ON r.n = ed.v
  ) GROUP BY 1, 2
), m2 AS (
  SELECT n, j, MAX(m) AS m FROM (
    SELECT n, j, m FROM m1
    UNION ALL
    SELECT ed.u AS n, r.j, r.m FROM ed JOIN m1 r ON r.n = ed.v
  ) GROUP BY 1, 2
)
{_ball_roll_sql("m1", 1)}
UNION ALL
{_ball_roll_sql("m2", 2)}
""")
def graph_hyperball_reach(spark, sf_dir):
    """HyperBall (Boldi & Vigna): the approximate neighborhood
    function — how many nodes are within radius t of each node —
    WITHOUT materializing reach sets: every node carries a {m}-
    register portable HLL of its ball, and one round of "ball(v, t) =
    ball(v, t-1) ∪ neighbors' balls(t-1)" is just MAX-merging register
    tables through the edge list.  This is the composition the two
    sketch families were built for: per-node state is O({m})
    REGARDLESS of reach size, so the 100 TB version of "average
    2-hop reach" costs t edge-joins instead of a combinatorial
    wedge/path explosion (contrast graph_two_hop_reach, which is
    exact and hub-capped for that reason).  Determinism of the md5
    registers makes the full sketch state value-gradeable: per
    radius, the node count, total hit buckets, and the EXACT decimal
    sum of per-node harmonic S2 terms — the state a consumer divides
    into alpha·m² to read off per-node estimates.  Plan: node-keyed
    register tables, {t} edge⋈register joins with map-side MAX
    combine; nothing ever grows past nodes × {m} rows."""
    e = _copurchase_edges(spark, sf_dir)
    ed = (e.select("u", "v")
          .unionAll(e.select(F.col("v").alias("u"),
                             F.col("u").alias("v"))))
    ed = ed.persist()
    n_ed = ed.count()
    # reduce-side width for the propagate stream (|edges| × ≤64
    # register rows): ~1M rows per task, clamped so tiny test graphs
    # don't pay hundreds of scheduler tasks and the dense sf1 graph
    # (~250M propagate rows) still gets the 256 ways that turned its
    # OOM into clean spill
    width = int(min(256, max(32, (n_ed * HLL_M) // 1_000_000)))
    nodes = ed.select(F.col("u").alias("n")).distinct()
    h = nodes.select("n", _h60(F.col("n")).alias("hv"))
    rank = F.when(
        F.shiftright("hv", HLL_M.bit_length() - 1) == 0,
        F.lit(_HLL_PAYLOAD_BITS + 1)
    ).otherwise(
        F.lit(_HLL_PAYLOAD_BITS + 1)
        - F.length(F.expr(
            f"bin(shiftright(hv, {HLL_M.bit_length() - 1}))")))
    m = h.select(
        "n", (F.col("hv") % HLL_M).cast("bigint").alias("j"),
        rank.cast("bigint").alias("m"))

    def roll(regs, t):
        return regs.agg(
            F.lit(t).cast("bigint").alias("radius"),
            F.countDistinct("n").cast("bigint").alias("n_nodes"),
            F.count(F.lit(1)).cast("bigint").alias("total_buckets_hit"),
            # exact DECIMAL(38,0) sum exceeds int64; emitted as its
            # decimal STRING — DuckDB's pandas export would silently
            # downcast a >2^63 decimal column to float64
            (F.sum(F.pow(F.lit(2).cast("bigint"),
                         _HLL_PAYLOAD_BITS + 1 - F.col("m"))
                   .cast("decimal(38,0)"))
             + (F.countDistinct("n").cast("decimal(38,0)") * HLL_M
                - F.count(F.lit(1)))
             * F.lit(_ZERO_TERM).cast("decimal(38,0)"))
            .cast("decimal(38,0)").cast("string").alias("sum_s2"),
        )

    out = None
    prev = None
    for t in range(1, _T + 1):
        prop = (ed.join(m.select(F.col("n").alias("v"), "j", "m"), "v")
                .select(F.col("u").alias("n"), "j", "m"))
        # the session's 32 shuffle partitions put whole-graph-sized
        # hash maps in each reduce task (OOM'd 8g at sf1); an explicit
        # size-scaled repartition on the MAX-merge key bounds per-task
        # state, and EnsureRequirements reuses the exchange for the
        # groupBy
        m = (m.unionAll(prop)
             .repartition(width, "n", "j")
             .groupBy("n", "j").agg(F.max("m").cast("bigint").alias("m"))
             .localCheckpoint(eager=True))
        # EAGERLY materialize this radius's 1-row rollup, then release
        # the PREVIOUS round's register table: the checkpointed tables
        # are nodes×64 DESERIALIZED rows each and accumulating them
        # across rounds (and bench repeats) OOM'd the shared heap at
        # sf1.  The rollup must be checkpointed first — it reads the
        # registers, and an unpersisted localCheckpoint is
        # unrecoverable (truncated lineage)
        r = roll(m, t).localCheckpoint(eager=True)
        if prev is not None:
            prev.unpersist()
        prev = m
        out = r if out is None else out.unionAll(r)
    ed.unpersist()
    prev.unpersist()
    return out


graph_hyperball_reach.__doc__ = graph_hyperball_reach.__doc__.format(
    m=HLL_M, t=_T)
