"""Market-basket analysis: frequent item pairs with exact support,
confidence, and lift over (basket, item) transaction tables.

The reference (widyaput/Cassandra-Join-Library) has no analytics
surface (SURVEY.md §2.6); association mining is the classic co-purchase
readout a curation/recommendation pipeline runs over order data.

Parity discipline: all counts are exact BIGINTs; support and
confidence are reported in parts-per-million via the repo's rounded
integer division (identical in Spark and DuckDB by construction); lift
is one fixed IEEE expression over exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rounded non-negative integer division (half away from zero) — the
# same macro contract as operators/graph.py / operators/stats.py
_RDIV = ("((({a}) div ({b})) + "
         "(CASE WHEN 2 * (({a}) % ({b})) >= ({b}) THEN 1 ELSE 0 END))")


def association_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    minsup_div: int = 2000,
    minsup_floor: int = 3,
    top: int = 20,
) -> DataFrame:
    """A-priori 2-itemset mining: item pairs co-occurring in at least
    ``max(minsup_floor, n_baskets div minsup_div)`` baskets, with
    exact support/confidence (parts-per-million) and lift, top-``top``
    by pair count (ties on item ids).

    Scale shape — the three standard guards that keep this linear at
    100 TB:

    1. **Relative min-support prune BEFORE pairing**: per-item basket
       counts are computed first (one map-side-combinable aggregate),
       infrequent items are dropped, and only then are within-basket
       pairs generated — the a-priori downward-closure step.  The
       frequent-item table is bounded by ``minsup_div`` (at most that
       many items can clear a 1/minsup_div relative threshold), so it
       broadcasts.
    2. **Per-basket fanout is pair-of-frequent-items**, bounded by
       basket size squared over the PRUNED item set, never corpus
       size.
    3. The pair aggregate itself is map-side combinable on (u, v).

    Support/confidence use the rounded integer ppm division; lift =
    ``n * c_uv / (c_u * c_v)`` is one double division over exact
    BIGINTs (``n * c_uv`` needs c_uv <= 2^63/n — at planetary scale
    switch the numerator to DECIMAL).  Returns
    (u, v, c_u, c_v, c_uv, supp_ppm, conf_uv_ppm, conf_vu_ppm, lift).
    """
    # three consumers (basket total, item counts, the pair join's two
    # sides) each prune different columns of this distinct — aggregate
    # exchange reuse can never fire (SCALE.md column-pruning rule), so
    # without materialization the input is scanned and de-duplicated
    # up to 7x.  Eager localCheckpoint = the dedup-module discipline
    # for corpus-sized multi-consumer intermediates: one scan + one
    # distinct, every consumer reads the checkpoint.
    baskets = (
        df.select(F.col(basket_col).alias("b"),
                  F.col(item_col).alias("i")).distinct()
        .localCheckpoint(eager=True)
    )
    totals = baskets.agg(
        F.countDistinct("b").cast("bigint").alias("n_baskets"))
    item_counts = baskets.groupBy("i").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    frequent = (
        item_counts.crossJoin(F.broadcast(totals))  # 1-row total
        .filter(F.col("c") >= F.greatest(
            F.lit(minsup_floor),
            F.expr(f"n_baskets div {minsup_div}")))
        .select("i", "c")
    )
    fb = baskets.join(F.broadcast(frequent), "i").select(
        "b", "i", "c")
    pairs = (
        fb.select("b", F.col("i").alias("u"), F.col("c").alias("c_u"))
        .join(fb.select("b", F.col("i").alias("v"),
                        F.col("c").alias("c_v")), "b")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v", "c_u", "c_v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_uv"))
        .crossJoin(F.broadcast(totals))  # 1-row total for the metrics
    )
    return (
        pairs.select(
            F.col("u").cast("bigint").alias("u"),
            F.col("v").cast("bigint").alias("v"),
            "c_u", "c_v", "c_uv",
            F.expr(_RDIV.format(a="1000000 * c_uv", b="n_baskets"))
            .cast("bigint").alias("supp_ppm"),
            F.expr(_RDIV.format(a="1000000 * c_uv", b="c_u"))
            .cast("bigint").alias("conf_uv_ppm"),
            F.expr(_RDIV.format(a="1000000 * c_uv", b="c_v"))
            .cast("bigint").alias("conf_vu_ppm"),
            ((F.col("n_baskets") * F.col("c_uv")).cast("double")
             / (F.col("c_u") * F.col("c_v")).cast("double"))
            .alias("lift"),
        )
        .orderBy(F.desc("c_uv"), F.asc("u"), F.asc("v"))
        .limit(top)
    )
