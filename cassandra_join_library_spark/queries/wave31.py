"""Round-12 wave: the Bloom membership store for cross-snapshot
dedup (r11 verdict ask #5) — the remaining piece of the
snapshot-at-rest story:

- ``dedup_cross_snapshot_bloom``: the wave-27 incremental dedup with
  the store join's probe side pre-pruned MAP-SIDE by the store's
  Bloom filter.  The Bloom has no false negatives, so the answer is
  bit-identical to the exact operator — the oracle IS the exact
  containment SQL — while new-crawl shingles absent from the store
  (the overwhelming majority in a healthy crawl) never shuffle.
- ``bloom_store_fp_audit``: the measured other half of that trade.
  The store's Bloom is built PORTABLY (md5-seeded positions, the
  MinHash convention) as a (w, word) table, so DuckDB reproduces the
  exact bit content, probes the same new-crawl shingles, and the
  false-positive rate — the number that sizes num_bits at 100 TB —
  is value-graded, not estimated from the (1-e^{-kn/m})^k formula.
  The audit embeds the four-shard bit_or merge proof (the HLL/CMS/
  log-bin pattern): a Bloom store that cannot merge cannot live at
  rest.

Extension surface (SURVEY.md §2.6); exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.bloom import bloom_pass_keys, bloom_words_table
from ..registry import register
from ..sources.catalog import load_table
from .wave27 import _SNAPSHOT_CTE

#: the AUDIT query's fixed sizing: 2^20 bits (16 K words / 128 KiB),
#: k = 5 probes — fixed so the DuckDB oracle replicates the exact bit
#: content, and so fp_ppm visibly degrades as the store outgrows it
_NUM_BITS = 1 << 20
_K = 5


def _sized_bits(n_keys: int) -> int:
    """Filter sizing at store-build time: ~16 bits/key (fp ~0.3% at
    k=5), next power of two, clamped to [2^16, 2^26].  The cap keeps
    the words table (num_bits/64 longs) at 1 M rows / ~16 MiB —
    broadcast-comfortable next to two checkpointed corpus-sized
    shingle frames in one executor heap (2^28 measurably OOM'd the
    sf10 single-JVM run).  Past ~4 M store keys the fp rate degrades
    instead of the memory — measurably (bloom_store_fp_audit, e.g.
    ~7% at 12 M keys), never as an OOM; pruning 93% of a new crawl
    is still the win."""
    bits = max(1 << 16, 16 * max(n_keys, 1))
    return min(1 << max(bits - 1, 1).bit_length(), 1 << 26)


@register("dedup_cross_snapshot_bloom", oracle=f"""
WITH {_SNAPSHOT_CTE}
SELECT doc_id, n_shingles, n_seen, containment_ppm,
       containment_ppm >= 800000 AS is_dup
FROM contain
""")
def dedup_cross_snapshot_bloom(spark, sf_dir):
    """Cross-snapshot incremental dedup THROUGH the store's Bloom
    filter: identical output to ``dedup_cross_snapshot`` (the oracle
    is literally the same exact-containment SQL — Bloom filters have
    no false negatives), but new-crawl shingles that fail the Bloom
    probe are dropped BEFORE the store sort-merge join, so only the
    pass fraction reaches it.  At 100 TB the store's Bloom is a
    PERSISTED (w, word) table (num_bits/64 rows — 1 M rows / ~16 MiB
    at the 2^26 cap — built once per snapshot with the store,
    bit_or-merged
    across shards), broadcast to probe the new crawl, and the store
    join moves roughly (containment + fp_rate) of the new crawl
    instead of all of it — ``bloom_store_fp_audit`` measures that
    fp_rate.  Probe cost is flat in filter size (the table path),
    so sizing ``_sized_bits`` up never slows the probe."""
    docs = load_table(spark, sf_dir, "documents")
    prior = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    # consumers: words build, exact verify join (module
    # materialization pattern).  The sizing count rides the checkpoint
    # job as an observe() metric (the store is DISTINCT, so count(*)
    # is its key cardinality) — sizing happens at store-build time in
    # production (the store's cardinality is known when it is
    # written), and folding it here drops a whole driver action per
    # query (r16 verdict ask #1 action-count discipline).
    from pyspark.sql import Observation

    obs = Observation()
    store = (D.shingles(prior, "doc_id", "text", 5)
             .select("shingle").distinct()
             .observe(obs, F.count(F.lit(1)).alias("n_keys"))
             .localCheckpoint(eager=True))
    bits = _sized_bits(int(obs.get["n_keys"] or 0))
    # portable=False (seeded xxhash64 positions): the screen's OUTPUT
    # is invariant to the hash family (no false negatives either way
    # — the oracle is the exact containment SQL), and xxhash64 drops
    # the concat+md5+substring+conv chain the build pays per store
    # key and the probe pays 5x per new-crawl (doc, shingle) row —
    # the dominant CPU of this query's filter stage.  The PORTABLE
    # family stays on ``bloom_store_fp_audit``, whose oracle rebuilds
    # the exact bit content; build and probe flags travel together.
    words = bloom_words_table(store, "shingle", bits, _K,
                              portable=False)
    out = D.cross_snapshot_containment(
        new, store, "doc_id", "text", n=5,
        store_bloom=words, bloom_bits=bits, bloom_hashes=_K,
        bloom_portable=False)
    return out.withColumn("is_dup", F.col("containment_ppm") >= 800000)


#: DuckDB twin of operators/bloom.py _portable_positions /
#: bloom_words_table / bloom_pass_keys over the wave-27 snapshot
#: split: k=5 md5-seeded positions, 2^20 bits, bit 63 CASEd around
#: the signed-shift overflow both engines share (wave-30 lesson)
_BLOOM_CTE = f"""
seeds AS (SELECT unnest([{", ".join(str(i) for i in range(_K))}]) AS i),
spos AS (
  SELECT s.shingle,
         ('0x' || substr(md5(i::VARCHAR || ':' || s.shingle), 1, 15))
           ::BIGINT % {_NUM_BITS} AS pos
  FROM store s, seeds
), bloom AS (
  SELECT CAST(pos // 64 AS BIGINT) AS w,
         CAST(bit_or(CASE WHEN pos % 64 = 63
                          THEN (-9223372036854775807)::BIGINT - 1
                          ELSE 1::BIGINT << CAST(pos % 64 AS INT) END)
              AS BIGINT) AS word
  FROM spos GROUP BY 1
), shardpos AS (
  SELECT ('0x' || substr(md5('shard:' || shingle), 1, 15))::BIGINT % 4
           AS shard_id, pos
  FROM spos
), shardwords AS (
  SELECT shard_id, CAST(pos // 64 AS BIGINT) AS w,
         CAST(bit_or(CASE WHEN pos % 64 = 63
                          THEN (-9223372036854775807)::BIGINT - 1
                          ELSE 1::BIGINT << CAST(pos % 64 AS INT) END)
              AS BIGINT) AS word
  FROM shardpos GROUP BY 1, 2
), merged AS (
  SELECT w, CAST(bit_or(word) AS BIGINT) AS word
  FROM shardwords GROUP BY 1
), mism AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_mismatch
  FROM bloom b FULL OUTER JOIN merged m USING (w)
  WHERE COALESCE(b.word, 0) != COALESCE(m.word, 0)
), probe_keys AS (
  SELECT DISTINCT shingle FROM news
), ppos AS (
  SELECT p.shingle,
         ('0x' || substr(md5(i::VARCHAR || ':' || p.shingle), 1, 15))
           ::BIGINT % {_NUM_BITS} AS pos
  FROM probe_keys p, seeds
), hits AS (
  SELECT p.shingle, COUNT(*) AS nhit
  FROM ppos p JOIN bloom b ON CAST(p.pos // 64 AS BIGINT) = b.w
   AND ((CASE WHEN p.pos % 64 = 63
              THEN (-9223372036854775807)::BIGINT - 1
              ELSE 1::BIGINT << CAST(p.pos % 64 AS INT) END)
        & b.word) != 0
  GROUP BY 1
), pass AS (
  SELECT shingle FROM hits WHERE nhit = {_K}
), truth AS (
  SELECT shingle FROM probe_keys INTERSECT SELECT shingle FROM store
)"""


@register("bloom_store_fp_audit", oracle=f"""
WITH {_SNAPSHOT_CTE},
{_BLOOM_CTE}
SELECT
  CAST((SELECT COUNT(*) FROM store) AS BIGINT) AS n_store,
  CAST((SELECT COUNT(*) FROM probe_keys) AS BIGINT) AS n_probes,
  CAST((SELECT COUNT(*) FROM pass) AS BIGINT) AS n_pass,
  CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
  (SELECT COUNT(*) FROM truth t JOIN pass p USING (shingle))
    = (SELECT COUNT(*) FROM truth) AS no_false_negatives,
  CAST(((SELECT COUNT(*) FROM pass) - (SELECT COUNT(*) FROM truth))
       * 1000000
       // GREATEST((SELECT COUNT(*) FROM probe_keys)
                   - (SELECT COUNT(*) FROM truth), 1)
    AS BIGINT) AS fp_ppm,
  (SELECT n_mismatch FROM mism) = 0 AS shards_match
""")
def bloom_store_fp_audit(spark, sf_dir):
    """One-row audit of the portable Bloom membership store over the
    wave-27 snapshot split: the store's md5-seeded (w, word) table is
    built single-pass AND by bit_or-merging four md5-sharded builds
    (shards_match proves the merge algebra — the property that lets
    per-day word tables fold into the corpus filter at rest), then
    every distinct new-crawl shingle probes it.  Graded outputs:
    pass/true counts, no_false_negatives (the theorem, checked), and
    fp_ppm — the measured false-positive rate among true negatives,
    i.e. the fraction of absent shingles the
    ``dedup_cross_snapshot_bloom`` prefilter would STILL shuffle.
    That number (vs the ~(1-e^{{-kn/m}})^k prediction) is what sizes
    num_bits for a real snapshot; when the store outgrows the filter
    it degrades toward 1e6 ppm — visibly, here, not as a silent OOM
    or slowdown."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(docs, "doc_id", "text", 5)
    # checkpoint budget (the sf10 OOM lesson): exactly TWO
    # corpus-sized frames live at once — store and news — same as the
    # proven wave-27 funnel; everything else is sketch-sized
    # consumers: words build, shard-words build, flags join, n_store
    store = (sh.filter(F.col("doc") % 2 == 0)
             .select("shingle").distinct()
             .localCheckpoint(eager=True))
    # consumers: probe, flags join
    news = (sh.filter(F.col("doc") % 2 == 1)
            .select("shingle").distinct()
            .localCheckpoint(eager=True))

    # single-pass build AND single-pass sharded build (shard= groups
    # one pass into 4 word tables; unioning 4 filtered builds would
    # scan the store 5x)
    shard_id = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.lit("shard:"), F.col("shingle"))), 1, 15),
            16, 10).cast("bigint"),
        F.lit(4))
    # <= 16 K rows, two consumers (merge proof + probe): checkpoint
    # is cheap and saves a full store re-scan
    words = bloom_words_table(store, "shingle", _NUM_BITS, _K)\
        .localCheckpoint(eager=True)
    merged = (bloom_words_table(store, "shingle", _NUM_BITS, _K,
                                shard=shard_id)
              .groupBy("w").agg(F.bit_or("word").alias("word")))
    mism = (words.withColumnRenamed("word", "g")
            .join(merged.withColumnRenamed("word", "m"), "w",
                  "full_outer")
            .filter(F.coalesce("g", F.lit(0))
                    != F.coalesce("m", F.lit(0)))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_mismatch")))

    passing = bloom_pass_keys(news, "shingle", words, _NUM_BITS, _K)
    # ONE flags pass computes every probe-side count: each probe
    # shingle left-joins its store membership and its Bloom verdict,
    # then a single aggregate folds them — no per-count joins, no
    # extra materializations (sort-merge: all three sides uncapped)
    flags = (
        news.hint("merge")
        .join(store.withColumn("in_store", F.lit(1)).hint("merge"),
              "shingle", "left")
        .join(passing.withColumn("passed", F.lit(1)).hint("merge"),
              "shingle", "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.coalesce(F.sum("passed"), F.lit(0)).cast("bigint")
            .alias("n_pass"),
            F.coalesce(F.sum("in_store"), F.lit(0)).cast("bigint")
            .alias("n_true"),
            F.coalesce(
                F.sum(((F.col("in_store") == 1)
                       & (F.col("passed") == 1)).cast("bigint")),
                F.lit(0)).cast("bigint").alias("n_true_pass"),
        ))
    n_store = store.agg(F.count(F.lit(1)).cast("bigint")
                        .alias("n_store"))
    return (n_store
            .crossJoin(F.broadcast(flags))
            .crossJoin(F.broadcast(mism))
            .select(
                "n_store", "n_probes", "n_pass", "n_true",
                (F.col("n_true_pass") == F.col("n_true"))
                .alias("no_false_negatives"),
                F.expr("(n_pass - n_true) * 1000000 "
                       "DIV GREATEST(n_probes - n_true, 1L)")
                .cast("bigint").alias("fp_ppm"),
                (F.col("n_mismatch") == 0).alias("shards_match")))
