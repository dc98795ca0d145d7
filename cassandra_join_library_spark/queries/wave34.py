"""Round-13 second wave: generational rotation of the Bloom
membership store — the operational move that keeps wave-31's
snapshot-at-rest store BOUNDED.

A production incremental-dedup store cannot grow forever: the filter
is kept as PER-GENERATION (w, word) tables (per month / per crawl),
the live filter is their bit_or merge (never a rebuild — the same
merge algebra the wave-31 audit proved), and rotation = dropping the
oldest generation's table from the merge.  What rotation costs is
measurable, not hand-waved: shingles present ONLY in the dropped
generation stop passing the filter, so the next crawl re-shuffles
and re-ingests them (stale_recrawl_ppm), while everything the
surviving generations know keeps its no-false-negative guarantee
(no_false_negatives_rot, checked).  ``rotation_drop_ppm`` is the
probe-pass mass the rotation sheds — the join traffic a bounded
store saves.

One shingle pass builds BOTH generation word tables (the shard=
hook); probes run twice against sketch-sized word tables.  Exact
membership truth rides along from the same checkpointed frames.
Extension surface (SURVEY.md §2.6); exact-value DuckDB oracle — the
md5-portable bit content makes even the filter's false positives
reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.bloom import bloom_pass_keys, bloom_words_table
from ..registry import register
from ..sources.catalog import load_table

#: fixed sizing, shared with the wave-31 audit: 2^20 bits, k=5 — so
#: the oracle replicates the exact bit content
_NUM_BITS = 1 << 20
_K = 5

#: DuckDB twin of the two-generation build + rotated probe: gen0 =
#: doc_id%3==0 (oldest), gen1 = %3==1 (recent), new crawl = %3==2
_ROTATION_CTE = f"""
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh0 AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 4),
                               i -> array_to_string(w[i:i+4], ' '))) AS shingle
  FROM words
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0
), gens AS (
  SELECT DISTINCT doc_id % 3 AS gen, shingle FROM sh WHERE doc_id % 3 != 2
), news AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 3 = 2
), seeds AS (SELECT unnest([{", ".join(str(i) for i in range(_K))}]) AS i),
gpos AS (
  SELECT g.gen, g.shingle,
         ('0x' || substr(md5(i::VARCHAR || ':' || g.shingle), 1, 15))
           ::BIGINT % {_NUM_BITS} AS pos
  FROM gens g, seeds
), genwords AS (
  SELECT gen, CAST(pos // 64 AS BIGINT) AS w,
         CAST(bit_or(CASE WHEN pos % 64 = 63
                          THEN (-9223372036854775807)::BIGINT - 1
                          ELSE 1::BIGINT << CAST(pos % 64 AS INT) END)
              AS BIGINT) AS word
  FROM gpos GROUP BY 1, 2
), fullf AS (
  SELECT w, CAST(bit_or(word) AS BIGINT) AS word FROM genwords GROUP BY 1
), rotf AS (
  SELECT w, word FROM genwords WHERE gen = 1
), ppos AS (
  SELECT n.shingle,
         ('0x' || substr(md5(i::VARCHAR || ':' || n.shingle), 1, 15))
           ::BIGINT % {_NUM_BITS} AS pos
  FROM news n, seeds
), hits_full AS (
  SELECT p.shingle, COUNT(*) AS nhit
  FROM ppos p JOIN fullf b ON CAST(p.pos // 64 AS BIGINT) = b.w
   AND ((CASE WHEN p.pos % 64 = 63
              THEN (-9223372036854775807)::BIGINT - 1
              ELSE 1::BIGINT << CAST(p.pos % 64 AS INT) END)
        & b.word) != 0
  GROUP BY 1
), pass_full AS (SELECT shingle FROM hits_full WHERE nhit = {_K}),
hits_rot AS (
  SELECT p.shingle, COUNT(*) AS nhit
  FROM ppos p JOIN rotf b ON CAST(p.pos // 64 AS BIGINT) = b.w
   AND ((CASE WHEN p.pos % 64 = 63
              THEN (-9223372036854775807)::BIGINT - 1
              ELSE 1::BIGINT << CAST(p.pos % 64 AS INT) END)
        & b.word) != 0
  GROUP BY 1
), pass_rot AS (SELECT shingle FROM hits_rot WHERE nhit = {_K}),
g0 AS (SELECT shingle FROM gens WHERE gen = 0),
g1 AS (SELECT shingle FROM gens WHERE gen = 1)"""


@register("bloom_store_rotation", oracle=f"""
WITH {_ROTATION_CTE}
SELECT
  CAST((SELECT COUNT(*) FROM g0) AS BIGINT) AS n_gen0,
  CAST((SELECT COUNT(*) FROM g1) AS BIGINT) AS n_gen1,
  CAST((SELECT COUNT(*) FROM news) AS BIGINT) AS n_probes,
  CAST((SELECT COUNT(*) FROM pass_full) AS BIGINT) AS n_pass_full,
  CAST((SELECT COUNT(*) FROM pass_rot) AS BIGINT) AS n_pass_rot,
  CAST((SELECT COUNT(*) FROM news JOIN g1 USING (shingle)) AS BIGINT)
    AS n_true_g1,
  CAST((SELECT COUNT(*) FROM news JOIN g0 USING (shingle)
        WHERE shingle NOT IN (SELECT shingle FROM g1)) AS BIGINT)
    AS n_true_g0_only,
  (SELECT COUNT(*) FROM news n JOIN g1 USING (shingle)
   JOIN pass_rot p ON p.shingle = n.shingle)
    = (SELECT COUNT(*) FROM news JOIN g1 USING (shingle))
    AS no_false_negatives_rot,
  CAST(((SELECT COUNT(*) FROM pass_full)
        - (SELECT COUNT(*) FROM pass_rot)) * 1000000
       // GREATEST((SELECT COUNT(*) FROM pass_full), 1) AS BIGINT)
    AS rotation_drop_ppm,
  CAST((SELECT COUNT(*) FROM news JOIN g0 USING (shingle)
        WHERE shingle NOT IN (SELECT shingle FROM g1)) * 1000000
       // GREATEST((SELECT COUNT(*) FROM news), 1) AS BIGINT)
    AS stale_recrawl_ppm
""")
def bloom_store_rotation(spark, sf_dir):
    """One-row audit of rotating the oldest generation out of the
    Bloom membership store: generation word tables built in ONE
    shingle pass (shard= hook), live filter = bit_or merge, rotated
    filter = the surviving generation's table unchanged.  Graded:
    store/probe sizes, pass counts through both filters, exact
    membership truth (g1, g0-only), the post-rotation no-false-
    negative guarantee, the pass mass rotation sheds
    (rotation_drop_ppm), and the re-ingest cost it accepts
    (stale_recrawl_ppm)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(docs, "doc_id", "text", 5)
    # checkpoint budget: two corpus-sized frames (gens carries both
    # generations tagged; news is the probe side) — the wave-31 rule
    gens = (sh.filter(F.col("doc") % 3 != 2)
            .select((F.col("doc") % 3).alias("gen"), "shingle")
            .distinct()
            .localCheckpoint(eager=True))
    news = (sh.filter(F.col("doc") % 3 == 2)
            .select("shingle").distinct()
            .localCheckpoint(eager=True))

    # one pass builds BOTH generation word tables; <= 2 * 16 K rows,
    # three consumers (merge, rotated probe, full probe): checkpoint
    genwords = bloom_words_table(gens, "shingle", _NUM_BITS, _K,
                                 shard=F.col("gen"))\
        .localCheckpoint(eager=True)
    full = genwords.groupBy("w").agg(F.bit_or("word").alias("word"))
    rot = genwords.filter(F.col("shard_id") == 1).select("w", "word")

    pass_full = bloom_pass_keys(news, "shingle", full, _NUM_BITS, _K)
    pass_rot = bloom_pass_keys(news, "shingle", rot, _NUM_BITS, _K)
    g0 = gens.filter(F.col("gen") == 0).select("shingle")
    g1 = gens.filter(F.col("gen") == 1).select("shingle")

    # ONE flags pass over the probe side folds every per-shingle
    # verdict (the wave-31 pattern); sort-merge hints: uncapped sides
    flags = (
        news.hint("merge")
        .join(g0.withColumn("in_g0", F.lit(1)).hint("merge"),
              "shingle", "left")
        .join(g1.withColumn("in_g1", F.lit(1)).hint("merge"),
              "shingle", "left")
        .join(pass_full.withColumn("pf", F.lit(1)).hint("merge"),
              "shingle", "left")
        .join(pass_rot.withColumn("pr", F.lit(1)).hint("merge"),
              "shingle", "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.coalesce(F.sum("pf"), F.lit(0)).cast("bigint")
            .alias("n_pass_full"),
            F.coalesce(F.sum("pr"), F.lit(0)).cast("bigint")
            .alias("n_pass_rot"),
            F.coalesce(F.sum("in_g1"), F.lit(0)).cast("bigint")
            .alias("n_true_g1"),
            F.coalesce(
                F.sum(((F.col("in_g0") == 1) & F.col("in_g1").isNull())
                      .cast("bigint")), F.lit(0)).cast("bigint")
            .alias("n_true_g0_only"),
            F.coalesce(
                F.sum(((F.col("in_g1") == 1) & (F.col("pr") == 1))
                      .cast("bigint")), F.lit(0)).cast("bigint")
            .alias("n_true_g1_pass_rot"),
        ))
    sizes = (gens.groupBy()
             .agg(F.sum((F.col("gen") == 0).cast("bigint"))
                  .cast("bigint").alias("n_gen0"),
                  F.sum((F.col("gen") == 1).cast("bigint"))
                  .cast("bigint").alias("n_gen1")))
    return (sizes.crossJoin(F.broadcast(flags)).select(
        "n_gen0", "n_gen1", "n_probes", "n_pass_full", "n_pass_rot",
        "n_true_g1", "n_true_g0_only",
        (F.col("n_true_g1_pass_rot") == F.col("n_true_g1"))
        .alias("no_false_negatives_rot"),
        F.expr("(n_pass_full - n_pass_rot) * 1000000 "
               "DIV GREATEST(n_pass_full, 1L)")
        .cast("bigint").alias("rotation_drop_ppm"),
        F.expr("n_true_g0_only * 1000000 DIV GREATEST(n_probes, 1L)")
        .cast("bigint").alias("stale_recrawl_ppm"),
    ))
