"""Round-9 twelfth wave: deterministic resampling inference — a
Poisson bootstrap confidence interval and a randomization test, both
md5-driven so every engine draws the identical resamples.

All extension surface (SURVEY.md §2.6); exact-value DuckDB oracles
under the repo parity conventions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_events
from .wave9 import _rdiv_sql
from ..operators.stats import _RDIV
from .wave12 import _VAL_CENTS  # the repo's one events-cents coercion

_B = 32  # resamples / permutations

# cumulative Poisson(1) thresholds in 2^20 units: P(K <= k) * 2^20
# for k = 0..5 (K >= 6 lumped into the tail) — baked-in integer
# constants so both engines draw the identical multiplicities
_POIS_CUM = (385749, 771499, 964373, 1028665, 1044738, 1047952)


def _pois_w_sql(h: str) -> str:
    """Poisson(1) multiplicity from a uniform 20-bit hash value."""
    cases = " ".join(
        f"WHEN ({h}) < {t} THEN {k}" for k, t in enumerate(_POIS_CUM))
    return f"(CASE {cases} ELSE 6 END)"


def _h20_sql(b: str, id_: str) -> str:
    return (f"(('0x' || substr(md5(CAST({b} AS VARCHAR) || '_' || "
            f"CAST({id_} AS VARCHAR)), 1, 15))::BIGINT % 1048576)")


def _h20_spark(b, id_):
    return (F.conv(F.substring(
        F.md5(F.concat(b.cast("string"), F.lit("_"),
                       id_.cast("string"))), 1, 15), 16, 10)
        .cast("bigint") % 1048576)


@register("stats_bootstrap_ci", oracle=f"""
WITH e AS (
  SELECT event_id, event_type, {_VAL_CENTS} AS cents FROM events
), rs AS (
  SELECT e.event_type, b.b,
         {_pois_w_sql(_h20_sql("b.b", "e.event_id"))} AS w,
         e.cents
  FROM e, (SELECT unnest(generate_series(0, {_B - 1})) AS b) b
), means AS (
  SELECT event_type, b,
         CAST({_rdiv_sql("SUM(w * cents)", "SUM(w)")} AS BIGINT)
           AS mean_cents
  FROM rs GROUP BY 1, 2 HAVING SUM(w) > 0
), ranked AS (
  SELECT event_type, mean_cents,
         row_number() OVER (PARTITION BY event_type
           ORDER BY mean_cents, b) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS nb
  FROM means
), obs AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST({_rdiv_sql("SUM(cents)", "COUNT(*)")} AS BIGINT)
           AS mean_cents_obs
  FROM e GROUP BY 1
)
SELECT o.event_type, o.n_rows, o.mean_cents_obs,
       CAST(MIN(CASE WHEN rk = 2 THEN mean_cents END) AS BIGINT)
         AS boot_lo_cents,
       CAST(MIN(CASE WHEN rk = nb - 1 THEN mean_cents END) AS BIGINT)
         AS boot_hi_cents
FROM obs o JOIN ranked r ON r.event_type = o.event_type
GROUP BY 1, 2, 3
""")
def stats_bootstrap_ci(spark, sf_dir):
    """Per-group mean with a POISSON BOOTSTRAP confidence band — the
    resampling scheme that actually works distributed (Chamandy et
    al.): instead of drawing n rows with replacement (which needs a
    global draw), every row independently enters resample b with
    Poisson(1) multiplicity — here DERIVED from md5(b, event_id)
    against baked-in cumulative thresholds, so the {B} resamples are
    a pure function of the data and both engines (and any
    partitioning, any retry) draw the SAME ones: the CI itself is
    value-graded, which no RNG bootstrap can offer.  One fanout-by-{B}
    pass feeding a map-side-combinable (group, b) aggregate; the
    band is the 2nd / {B}-1th order statistic of the resample means
    (~94% coverage at B={B}).  Values in exact integer cents, means
    by rounded integer division."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "event_type", F.expr(_VAL_CENTS).alias("cents"))
    h = _h20_spark(F.col("b"), F.col("event_id"))
    w = F.when(h < _POIS_CUM[0], 0)
    for k, t in enumerate(_POIS_CUM[1:], start=1):
        w = w.when(h < t, k)
    w = w.otherwise(6)
    rs = ev.select(
        "event_type", "cents", "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    ).select("event_type", "b", "cents", w.alias("w"))
    means = (rs.groupBy("event_type", "b")
             .agg(F.sum(F.col("w") * F.col("cents")).alias("swc"),
                  F.sum("w").alias("sw"))
             .filter(F.col("sw") > 0)
             .select("event_type", "b",
                     F.expr(_RDIV.format(a="swc", b="sw"))
                     .cast("bigint").alias("mean_cents")))
    wnd = Window.partitionBy("event_type").orderBy("mean_cents", "b")
    cnt = Window.partitionBy("event_type")
    ranked = means.select(
        "event_type", "mean_cents",
        F.row_number().over(wnd).alias("rk"),
        F.count(F.lit(1)).over(cnt).alias("nb"))
    obs = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr(_RDIV.format(a="SUM(cents)", b="COUNT(*)"))
        .cast("bigint").alias("mean_cents_obs"))
    return (obs.join(ranked, "event_type")
            .groupBy("event_type", "n_rows", "mean_cents_obs")
            .agg(F.min(F.when(F.col("rk") == 2, F.col("mean_cents")))
                 .cast("bigint").alias("boot_lo_cents"),
                 F.min(F.when(F.col("rk") == F.col("nb") - 1,
                              F.col("mean_cents")))
                 .cast("bigint").alias("boot_hi_cents")))


stats_bootstrap_ci.__doc__ = stats_bootstrap_ci.__doc__.format(B=_B)


@register("stats_randomization_test", oracle=f"""
WITH e AS (
  SELECT event_id, event_type, {_VAL_CENTS} AS cents FROM events
  WHERE event_type IN ('purchase', 'view')
), obs AS (
  SELECT CAST({_rdiv_sql(
      "SUM(CASE WHEN event_type = 'purchase' THEN cents END)",
      "COUNT(*) FILTER (event_type = 'purchase')")} AS BIGINT)
       - CAST({_rdiv_sql(
      "SUM(CASE WHEN event_type = 'view' THEN cents END)",
      "COUNT(*) FILTER (event_type = 'view')")} AS BIGINT) AS d_obs
  FROM e
), perms AS (
  SELECT b.b,
         CAST({_rdiv_sql(
      "SUM(CASE WHEN " + _h20_sql("b.b", "e.event_id")
      + " % 2 = 0 THEN cents END)",
      "COUNT(*) FILTER (" + _h20_sql("b.b", "e.event_id")
      + " % 2 = 0)")} AS BIGINT)
       - CAST({_rdiv_sql(
      "SUM(CASE WHEN " + _h20_sql("b.b", "e.event_id")
      + " % 2 = 1 THEN cents END)",
      "COUNT(*) FILTER (" + _h20_sql("b.b", "e.event_id")
      + " % 2 = 1)")} AS BIGINT) AS d_b
  FROM e, (SELECT unnest(generate_series(0, {_B - 1})) AS b) b
  GROUP BY 1
)
SELECT (SELECT d_obs FROM obs) AS obs_diff_cents,
       CAST(COUNT(*) FILTER (abs(d_b) >= abs((SELECT d_obs FROM obs)))
            AS BIGINT) AS n_extreme,
       CAST({_B} AS BIGINT) AS n_perms,
       CAST({_rdiv_sql(
           "1000000 * COUNT(*) FILTER (abs(d_b) >= "
           "abs((SELECT d_obs FROM obs)))", str(_B))} AS BIGINT)
         AS p_ppm
FROM perms
""")
def stats_randomization_test(spark, sf_dir):
    """Does purchase value differ from view value?  A RANDOMIZATION
    test with deterministic md5 relabelings: each of the {B} rounds
    reassigns every row to a pseudo-group by hash parity and
    recomputes the mean difference; the p-value is the fraction of
    relabeled differences at least as extreme as the observed one.
    Like the bootstrap twin, determinism turns a Monte-Carlo
    procedure into a value-graded query — same resamples on any
    engine, any partitioning, any retry.  One fanout-by-{B} grouped
    aggregate over the two-group slice; integer cents throughout."""
    ev = (load_events(spark, sf_dir)
          .filter(F.col("event_type").isin("purchase", "view"))
          .select("event_id", "event_type",
                  F.expr(_VAL_CENTS).alias("cents")))
    is_p = F.col("event_type") == "purchase"
    obs = ev.agg(
        (F.expr(_RDIV.format(
            a="SUM(CASE WHEN event_type = 'purchase' THEN cents END)",
            b="COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)"))
         - F.expr(_RDIV.format(
             a="SUM(CASE WHEN event_type = 'view' THEN cents END)",
             b="COUNT(CASE WHEN event_type = 'view' THEN 1 END)")))
        .cast("bigint").alias("d_obs"))
    rs = ev.select(
        "cents", "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"))
    par = (_h20_spark(F.col("b"), F.col("event_id")) % 2 == 0)
    perms = (rs.groupBy("b")
             .agg(F.sum(F.when(par, F.col("cents"))).alias("s0"),
                  F.count(F.when(par, F.lit(1))).alias("n0"),
                  F.sum(F.when(~par, F.col("cents"))).alias("s1"),
                  F.count(F.when(~par, F.lit(1))).alias("n1"))
             .select("b",
                     (F.expr(_RDIV.format(a="s0", b="n0"))
                      - F.expr(_RDIV.format(a="s1", b="n1")))
                     .cast("bigint").alias("d_b")))
    return (perms.crossJoin(F.broadcast(obs))
            .agg(F.min("d_obs").cast("bigint").alias("obs_diff_cents"),
                 F.sum(F.when(F.abs("d_b") >= F.abs("d_obs"), 1)
                       .otherwise(0)).cast("bigint").alias("n_extreme"),
                 F.lit(_B).cast("bigint").alias("n_perms"))
            .select("obs_diff_cents", "n_extreme", "n_perms",
                    F.expr(_RDIV.format(a="1000000 * n_extreme",
                                        b=str(_B)))
                    .cast("bigint").alias("p_ppm")))


stats_randomization_test.__doc__ = stats_randomization_test.__doc__.format(
    B=_B)
