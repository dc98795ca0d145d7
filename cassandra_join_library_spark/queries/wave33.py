"""Round-13 wave: image perceptual-hash dedup — the multimodal twin
of the SimHash text path.

``mm_phash_dedup`` closes a real gap in the multimodal surface: the
dedup family fingerprinted TEXT (shingles, minhash, simhash,
winnowing) while the mm family decoded FORMATS (BMP/WAV/PNG/MP4
headers, PCM frames) — this query fuses them into the operation a
100 TB image corpus actually runs: decode pixels -> perceptual
average-hash -> exact Hamming-radius pair join.

The pipeline is byte-real end to end with zero codec libraries:
spec-conformant 8x8 24bpp BMPs WITH pixel data are synthesized as
binary payloads (operators/multimodal.py synthesize_bmp_pixels — a
content-group formula plants exact duplicates and near-duplicate
"retouches"), the 64 luma bytes are read back by hex-offset
arithmetic (bmp_ahash), the aHash bit is the scale-free integer
compare ``64*luma > sum(lumas)`` (no float mean, no division), and
pairs within Hamming <= 2 come from the EXACT pigeonhole chunk join
shared with SimHash (operators/dedup.py hamming_band_pairs) — never
the n² pair space.  The DuckDB oracle rebuilds the same BMP bytes
with from_hex/string_agg, re-parses them, and brute-forces all pairs,
so encode, decode, hash, and radius semantics are all value-graded.

At 100 TB: synthesis is replaced by reading the real image bytes; the
decode+hash stays map-only per image, fingerprints are 8 bytes per
image, and the chunk join's candidate count is bounded by band-key
collisions — the same scaling contract as dedup_simhash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import multimodal as M
from ..registry import register
from ..sources.catalog import load_table, spread_input


def _phash_fingerprints(spark, sf_dir):
    """(doc, fp) aHash fingerprint table over the synthesized BMP
    corpus — shared by both queries, the stratum self-check script
    (scripts/phash_stratum_check.py), and the pinned exactness test.

    Materialized (localCheckpoint) before any self-join: with the
    synth+decode expression tree left in the lineage, join planning
    re-derives the whole byte pipeline on both sides (153 s for 500
    rows); cut, it's 1.5 s.  Unlike the text simhash (whose
    fingerprints come out of a groupBy, a natural materialization
    point), this pipeline is map-only end to end, so the cut must be
    explicit.

    Repartitioned BEFORE the per-image decode (the round-15 lesson
    from the audio twin): the sf fixtures are one small parquet file
    -> one input split, which serializes the CPU-bound decode+hash on
    a single task; a real image corpus gets the parallelism from its
    file splits — the explicit repartition stands in for that."""
    docs = spread_input(
        load_table(spark, sf_dir, "documents").select("doc_id"))
    imgs = M.synthesize_bmp_pixels(docs, "doc_id", n_groups=100)
    fps = M.bmp_ahash(imgs, "doc_id")
    return (fps.filter(F.col("is_bmp"))
            .select(F.col("doc_id").alias("doc"),
                    F.col("ahash").alias("fp"))
            .localCheckpoint(eager=True))


@register("mm_phash_dedup", oracle="""
WITH src AS (
  SELECT doc_id, doc_id % 100 AS g, (doc_id // 100) % 3 AS v
  FROM documents
), px AS (
  SELECT doc_id, i.i AS i,
         (g*37 + i.i*29) % 160 + 40
         + CASE WHEN (v = 1 AND i.i = 0) OR (v = 2 AND i.i < 4)
                THEN 56 ELSE 0 END AS luma
  FROM src, (SELECT unnest(generate_series(0, 63)) AS i) i
), built AS (
  SELECT doc_id, from_hex(
    '424d' || 'f6000000' || '00000000' || '36000000' || '28000000'
    || '08000000' || '08000000' || '0100' || '1800' || repeat('00', 24)
    || string_agg(repeat(lpad(to_hex(luma), 2, '0'), 3), '' ORDER BY i)
  ) AS payload
  FROM px GROUP BY doc_id
), hx AS (
  SELECT doc_id, hex(payload) AS h, octet_length(payload) AS n
  FROM built
), lum AS (
  SELECT doc_id, i.i AS i,
         ('0x' || substr(h, (54 + 3*i.i)*2 + 1, 2))::BIGINT AS luma
  FROM hx, (SELECT unnest(generate_series(0, 63)) AS i) i
  WHERE n >= 246 AND substr(h, 1, 4) = '424D'
), tot AS (
  SELECT doc_id, SUM(luma) AS total FROM lum GROUP BY 1
), fp AS (
  SELECT lum.doc_id,
         CAST(SUM(CASE WHEN lum.i < 60 AND lum.luma * 64 > tot.total
                       THEN (1::BIGINT << lum.i) ELSE 0 END)
              AS BIGINT) AS ahash
  FROM lum JOIN tot ON tot.doc_id = lum.doc_id
  GROUP BY 1
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
""")
def mm_phash_dedup(spark, sf_dir):
    """Image near-dup pairs by perceptual average-hash (Hamming <= 2)
    over real 8x8 BMP payloads: synthesize -> byte-decode -> integer
    aHash -> exact pigeonhole band join.  The content-group fixture
    plants exact duplicates (identical ahash) and single-pixel
    retouches (Hamming 1-2); heavier 4-pixel edits fall outside the
    radius and must NOT pair — the oracle brute-forces the full pair
    space to grade exactly that cut."""
    fps = _phash_fingerprints(spark, sf_dir)
    return D.hamming_band_pairs(fps, bits=60, max_hamming=2,
                                by_value=True)


_PHASH_FP_CTE = """
src AS (
  SELECT doc_id, doc_id % 100 AS g, (doc_id // 100) % 3 AS v
  FROM documents
), px AS (
  SELECT doc_id, i.i AS i,
         (g*37 + i.i*29) % 160 + 40
         + CASE WHEN (v = 1 AND i.i = 0) OR (v = 2 AND i.i < 4)
                THEN 56 ELSE 0 END AS luma
  FROM src, (SELECT unnest(generate_series(0, 63)) AS i) i
), tot AS (
  SELECT doc_id, SUM(luma) AS total FROM px GROUP BY 1
), fp AS (
  SELECT px.doc_id,
         CAST(SUM(CASE WHEN px.i < 60 AND px.luma * 64 > tot.total
                       THEN (1::BIGINT << px.i) ELSE 0 END)
              AS BIGINT) AS ahash
  FROM px JOIN tot ON tot.doc_id = px.doc_id
  GROUP BY 1
)"""


@register("mm_phash_recall_audit", oracle=f"""
WITH {_PHASH_FP_CTE},
pred AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
), truth AS (
  -- planted ground truth: same content group, and either both sides
  -- are the base/retouch variants (v in 0,1) or the same variant
  -- (identical bytes)
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM src a JOIN src b ON a.g = b.g AND a.doc_id < b.doc_id
  WHERE (a.v IN (0, 1) AND b.v IN (0, 1)) OR a.v = b.v
), nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pred FROM pred),
nh AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM pred JOIN truth ON truth.doc_a = pred.doc_a
                      AND truth.doc_b = pred.doc_b
)
SELECT n_true, n_pred, n_hit,
       CAST(CASE WHEN n_true > 0
            THEN 1000000 * n_hit // n_true END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN n_pred > 0
            THEN 1000000 * n_hit // n_pred END AS BIGINT)
         AS precision_ppm
FROM nt CROSS JOIN np CROSS JOIN nh
""")
def mm_phash_recall_audit(spark, sf_dir):
    """Measured perceptual-hash quality against planted ground truth:
    the Hamming<=2 pair set (the exact band join) versus the fixture's
    known duplicate structure (same content group, base/retouch
    variants or identical bytes) — recall and precision in floor ppm.
    The audit one runs before trusting a perceptual-hash radius on a
    real image corpus: aHash flips bits when a retouch crosses the
    brightness mean, so recall < 1 at any fixed radius, and the
    measured number (not the assumption) is what sets the radius /
    verify budget at 100 TB.  Same family as dedup_lsh_recall_audit /
    ann_*_recall_audit: the compression trade is graded, never
    presumed.  Truth side is formula-bounded (group-sized join, never
    the image pair space); predicted side is the banded join."""
    fps = _phash_fingerprints(spark, sf_dir)
    pred = D.hamming_band_pairs(fps, bits=60, max_hamming=2,
                                by_value=True) \
        .select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    lab = docs.select(
        "doc_id", (F.col("doc_id") % 100).alias("g"),
        ((F.col("doc_id") / 100).cast("bigint") % 3).alias("v"))
    a = lab.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("g_a"),
                   F.col("v").alias("v_a"))
    b = lab.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("g_b"),
                   F.col("v").alias("v_b"))
    truth = (a.join(b, (F.col("g_a") == F.col("g_b"))
                    & (F.col("doc_a") < F.col("doc_b")))
             .filter((F.col("v_a").isin(0, 1) & F.col("v_b").isin(0, 1))
                     | (F.col("v_a") == F.col("v_b")))
             .select("doc_a", "doc_b"))
    nt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    np_ = pred.agg(F.count(F.lit(1)).cast("bigint").alias("n_pred"))
    nh = pred.join(truth, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    return (nt.crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(nh))
            .select(
                "n_true", "n_pred", "n_hit",
                F.when(F.col("n_true") > 0,
                       F.expr("1000000 * n_hit DIV n_true"))
                .cast("bigint").alias("recall_ppm"),
                F.when(F.col("n_pred") > 0,
                       F.expr("1000000 * n_hit DIV n_pred"))
                .cast("bigint").alias("precision_ppm")))
