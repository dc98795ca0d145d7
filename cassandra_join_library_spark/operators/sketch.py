"""Portable deterministic sketches.

Spark's native sketches (HyperLogLog++ `approx_count_distinct`,
Datasketches `hll_sketch_agg`, `percentile_approx`) are the production
path at 100 TB — but their internals are engine-specific, so the
queries built on them can only ever get a rows-only correctness check.
These twins trade a constant factor for PORTABILITY: every step is a
deterministic function of the data (md5-derived 60-bit hashes, exact
arithmetic, fixed tie-breaks), so DuckDB reproduces the estimates
bit-for-bit and the driver gets a FULL value oracle over *approximate*
operators — the estimate itself is graded, not just its row count.

- :func:`kmv_distinct` — K-Minimum-Values distinct-count estimator
  (Bar-Yossef et al.): keep the k smallest hash values per group; with
  uniform 60-bit hashes, E[#distinct] ≈ (k-1) · 2^60 / kth_min.
  Relative error ~ 1/√k (k=256 → ~6%).
- :func:`sampled_percentiles` — hash-Bernoulli sample (keep rows whose
  60-bit hash < 2^60 / rate), exact percentiles of the sample.  The
  sample is a pure function of the rows, so both engines select the
  identical subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^60 — the hash space of a 15-hex-digit md5 prefix (fits BIGINT)
HASH_SPACE = 1 << 60


def _h60(col) -> "F.Column":
    """Deterministic uniform 60-bit hash: decimal value of the first 15
    hex digits of md5 of the value's string form.  Identical in any
    engine with md5 (DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``)
    — for INTEGER and STRING inputs, whose string forms are canonical.
    Floats/timestamps format differently across engines ('1.0E20' vs
    '1e+20'), so the cross-engine contract does not extend to them;
    hash a stable key column instead."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group approximate distinct count via K Minimum Values.

    Hash every value, keep the k smallest DISTINCT hashes per group;
    the kth-smallest hash position estimates density:
    ``(k-1) · 2^60 / kth`` (groups with fewer than k distinct values
    report their exact count — the estimator is exact below k).

    Plan: one (group, hash) distinct aggregate, one group-keyed top-k
    window (WindowGroupLimit pushes the rank filter below the full
    sort — each map task keeps a partial top-k, the classic mergeable-
    sketch shape), one per-group max/count.  All shuffles on the group
    key.  Estimate arithmetic: ``(k-1) · 2^60`` is an exact double
    (integer · power of two), kth converts BIGINT→double with IEEE
    round-to-nearest in both engines, one division, rounded to 2 dp —
    engine-identical end to end.

    Returns (group, n_min_values, approx_distinct).  NULL values are
    excluded up front (they are not a value; left in, md5(NULL)=NULL
    would eat a sketch slot under Spark's NULLS-FIRST ascending sort
    while the SQL twin sorts NULLs last — divergent estimates).
    """
    hashes = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col), _h60(F.col(value_col)).alias("_h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("_h")
    topk = (
        hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    agg = topk.groupBy(group_col).agg(
        F.max("_h").alias("_kth"),
        F.count(F.lit(1)).cast("bigint").alias("n_min_values"),
    )
    est = F.when(
        F.col("n_min_values") < k, F.col("n_min_values").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * HASH_SPACE)) / F.col("_kth").cast("double")
    )
    return agg.select(
        group_col,
        "n_min_values",
        F.round(est, 2).alias("approx_distinct"),
    )


def sampled_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    rate: int = 8,
    percentiles: "tuple[float, ...]" = (0.5, 0.9, 0.99),
    round_to: int = 6,
) -> DataFrame:
    """Per-group approximate percentiles from a deterministic
    hash-Bernoulli sample.

    Rows whose 60-bit hash of (id) falls below ``2^60 / rate`` form a
    1/rate sample — a pure function of the row, so any engine (and any
    re-run, at any parallelism) draws the IDENTICAL sample; exact
    percentiles of the sample then approximate the population's.  The
    1/rate scan-output reduction is the point at 100 TB: the exact
    sort only ever sees the sample.  Returns one row per group WITH AT
    LEAST ONE SAMPLED ROW (a tiny group can miss the sample entirely —
    left-join the output back if every group key must appear), with
    ``n_sampled`` and one column per requested percentile
    (``p50``, ``p90``, ...; distinct whole-percent values only —
    colliding names raise instead of silently mislabeling a quantile).
    """
    names = [f"p{round(p * 100)}" for p in percentiles]
    if len(set(names)) != len(names):
        raise ValueError(
            f"percentiles {percentiles} collide after whole-percent "
            f"naming ({names}) — use distinct whole-percent values"
        )
    thresh = HASH_SPACE // rate
    sample = df.filter(_h60(F.col(id_col)) < thresh)
    v6 = F.round(F.col(value_col).cast("double"), round_to)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_sampled")]
    for p, name in zip(percentiles, names):
        aggs.append(F.round(F.percentile(v6, F.lit(p)), round_to).alias(name))
    return sample.groupBy(group_col).agg(*aggs)
