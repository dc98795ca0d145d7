"""Round-16 wave: video keyframe-fingerprint dedup — completes the
fingerprint-dedup family's modality trio (text SimHash, image aHash,
audio energy-diff) with VIDEO, the one modality that previously had
parse-only coverage (mm_mp4_box_parse), named as the best-paying
candidate by the r15 verdict (ask #3).

``mm_video_keyframe_dedup`` runs the operation a 100 TB video corpus
actually runs: locate the frame payload by CHAINING ISO-BMFF box
sizes (never a fixed offset — the ftyp brand tail and an optional
`free` box shift `mdat` per stream), perceptual-hash each sampled
keyframe, and pair videos whose EVERY keyframe lands within a small
Hamming radius.  The per-frame hash is the same scale-free integer
aHash as the image path (bit i = 64*luma_i > sum of the frame's
lumas, 60 bits in a signed BIGINT), and the pair join is the shared
EXACT pigeonhole chunk join (operators/dedup.py hamming_band_pairs)
extended with a group column so frame-0 only ever meets frame-0 —
ONE banded self-join for all frames, never one join per frame index
and never the n² pair space.  Video-level dedup then demands all
``n_frames`` frames match: a pair with any frame outside the radius
yields fewer than ``n_frames`` banded rows and is dropped by the
count filter.

The pipeline is byte-real end to end with zero codec libraries: the
fixture synthesizes spec-conformant MP4 streams whose `mdat` carries
four real 8x8 grayscale keyframes (operators/multimodal.py
synthesize_mp4_keyframes — a content-group formula plants exact
duplicates, single-frame "retouch" near-dups, and every-frame
re-grades that usually, not always, leave the radius), and the DuckDB
oracle independently rebuilds the same bytes with lpad/to_hex/
string_agg, reads the lumas back out of its own hex image, and
brute-forces the full pair space — so container layout, the box walk,
per-frame hashing, and the all-frames radius cut are all
value-graded.

At 100 TB: synthesis is replaced by reading real video bytes (a real
deployment samples keyframes with a decoder — mm_decode_features
carries the Arrow mapInPandas plumbing for that); the walk+hash stays
map-only per clip, fingerprints are 8 bytes per (clip, frame), and
the banded join's candidate count is bounded by (band key, frame)
collisions — the same scaling contract as the image and audio twins.

Reference parity: the reference library (cassandra_joinlib/, row-dict
join machinery) has no multimodal surface; this wave is part of the
LLM-pipeline extension family (SURVEY.md north star).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import multimodal as M
from ..registry import register
from ..sources.catalog import load_table, spread_input

_N_FRAMES = 4


def _video_fingerprints(spark, sf_dir):
    """(doc, frame, fp) keyframe aHash table over the synthesized MP4
    corpus — shared by both queries, the sf1 stratum self-check
    script (scripts/phash_stratum_check.py --family video), and the
    pinned exactness test.

    Materialized (localCheckpoint) before the banded self-join: the
    synth + box-walk + decode expression tree left in the lineage
    would be re-derived on both join sides (the wave-33 lesson: 153 s
    vs 1.5 s for 500 rows).  Repartitioned BEFORE the per-clip decode
    (the wave-36 lesson): the sf fixtures are one parquet split -> one
    input task, which serializes the CPU-bound walk+hash; a real video
    corpus gets its parallelism from file splits — the explicit
    repartition stands in for that."""
    docs = spread_input(
        load_table(spark, sf_dir, "documents").select("doc_id"))
    clips = M.synthesize_mp4_keyframes(docs, "doc_id", n_groups=100,
                                       n_frames=_N_FRAMES)
    fps = M.mp4_keyframe_ahash(clips, "doc_id", n_frames=_N_FRAMES)
    return (fps.select(F.col("doc_id").alias("doc"), "frame", "fp")
            .localCheckpoint(eager=True))


# luma + payload-hex reconstruction shared by both oracles: the byte
# image DuckDB builds is INDEPENDENT of Spark's (lpad/to_hex/
# string_agg vs Column concat), and the read side pulls lumas back out
# of that hex image at the formula-derived mdat offset — so a Spark
# synth/walk bug that lands frames at the wrong byte cannot cancel
# out (the wave-33 grading discipline)
_VIDEO_FP_CTE = """
src AS (
  SELECT doc_id, doc_id % 100 AS g, (doc_id // 100) % 3 AS v
  FROM documents
), gv AS (
  SELECT DISTINCT g, v FROM src
), px AS (
  SELECT g, v, f.f AS f, i.i AS i,
         ('0x' || substr(md5(g || '_' || f.f || '_' || i.i), 1, 2)
         )::BIGINT % 160 + 40
         + CASE WHEN (v = 1 AND f.f = 0 AND i.i = 0)
                  OR (v = 2 AND i.i < 4) THEN 56 ELSE 0 END AS luma
  FROM gv, (SELECT unnest(generate_series(0, 3)) AS f) f,
       (SELECT unnest(generate_series(0, 63)) AS i) i
), built AS (
  SELECT g, v,
         lpad(to_hex(16 + 4*(g % 3)), 8, '0') || '66747970'
         || '69736f6d' || '00000200' || repeat('69736f6d', g % 3)
         || CASE WHEN g % 2 = 0
              THEN lpad(to_hex(8 + (g*7 + v) % 16), 8, '0')
                   || '66726565' || repeat('00', (g*7 + v) % 16)
              ELSE '' END
         || lpad(to_hex(8 + 256), 8, '0') || '6d646174'
         || string_agg(lpad(to_hex(luma), 2, '0'), '' ORDER BY f, i)
           AS h,
         16 + 4*(g % 3)
         + CASE WHEN g % 2 = 0 THEN 8 + (g*7 + v) % 16 ELSE 0 END
         + 8 AS data_off
  FROM px GROUP BY g, v
), lum AS (
  SELECT s.doc_id, f.f AS f, i.i AS i,
         ('0x' || substr(b.h, (b.data_off + 64*f.f + i.i)*2 + 1, 2)
         )::BIGINT AS luma
  FROM src s JOIN built b ON b.g = s.g AND b.v = s.v,
       (SELECT unnest(generate_series(0, 3)) AS f) f,
       (SELECT unnest(generate_series(0, 63)) AS i) i
), tot AS (
  SELECT doc_id, f, SUM(luma) AS total FROM lum GROUP BY 1, 2
), fp AS (
  SELECT lum.doc_id, lum.f,
         CAST(SUM(CASE WHEN lum.i < 60 AND lum.luma * 64 > tot.total
                       THEN (1::BIGINT << lum.i) ELSE 0 END)
              AS BIGINT) AS fp
  FROM lum JOIN tot ON tot.doc_id = lum.doc_id AND tot.f = lum.f
  GROUP BY 1, 2
)"""


@register("mm_video_keyframe_dedup", oracle=f"""
WITH {_VIDEO_FP_CTE}
-- per-frame radius filter BELOW the pair aggregate (equivalent to
-- HAVING MAX(hamming) <= 2 over all 4 frames, since each frame
-- contributes at most one row per pair and a pair qualifies only
-- with all 4 rows surviving) — the aggregate then sees ~planted-pair
-- rows, not the full n^2/2 group space, keeping the sf1 brute gate
-- inside DuckDB's memory
SELECT doc_a, doc_b, CAST(MAX(h) AS BIGINT) AS max_hamming
FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.fp, b.fp)) AS h
  FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.fp, b.fp)) <= 2
)
GROUP BY 1, 2
HAVING COUNT(*) = 4
""")
def mm_video_keyframe_dedup(spark, sf_dir):
    """Video near-dup pairs by keyframe perceptual hash: box-walk to
    the frame bytes, aHash each of the 4 keyframes, ONE banded
    frame-to-frame Hamming join (radius 2), and keep pairs whose
    EVERY keyframe matched.  The fixture plants exact duplicates
    (identical streams), single-frame retouches (one keyframe at
    Hamming 1-2, the rest identical), and every-frame re-grades that
    must usually NOT pair — the oracle brute-forces the full pair
    space to grade exactly that cut."""
    fps = _video_fingerprints(spark, sf_dir)
    per_frame = D.hamming_band_pairs(fps, bits=60, max_hamming=2,
                                     group_col="frame")
    return (per_frame.groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.max("hamming").cast("bigint").alias("max_hamming"))
            .filter(F.col("_n") == _N_FRAMES)
            .select("doc_a", "doc_b", "max_hamming"))


@register("mm_video_fp_recall_audit", oracle=f"""
WITH {_VIDEO_FP_CTE},
pred AS (
  -- same pushed-down per-frame radius filter as the dedup oracle
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 2
  )
  GROUP BY 1, 2
  HAVING COUNT(*) = 4
), truth AS (
  -- planted ground truth: same content group, and either both sides
  -- are the base/retouch variants (v in 0,1) or the same variant
  -- (identical streams)
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
def mm_video_fp_recall_audit(spark, sf_dir):
    """Measured keyframe-fingerprint quality against planted ground
    truth: the all-frames-within-Hamming-2 pair set versus the
    fixture's known duplicate structure (same content group,
    base/retouch variants or identical streams) — recall and
    precision in floor ppm.  A single-frame retouch only pairs when
    its edited keyframe stays within the radius, so recall < 1 at any
    fixed radius and the measured number (not the assumption) is what
    sets the radius / frames-sampled budget on a real corpus — the
    same graded-compression discipline as mm_phash_recall_audit and
    mm_audio_fp_recall_audit.  Truth side is formula-bounded
    (group-sized join, never the clip pair space); predicted side is
    the banded join."""
    fps = _video_fingerprints(spark, sf_dir)
    pred = (D.hamming_band_pairs(fps, bits=60, max_hamming=2,
                                 group_col="frame")
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") == _N_FRAMES)
            .select("doc_a", "doc_b"))
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
    nh = (pred.join(truth, ["doc_a", "doc_b"])
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit")))
    # integer DIV on both engines — exact floor ppm, no float rounding
    # (the round(x/y) oracle sites are the sf10 drift watch class)
    return (nt.crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(nh))
            .select(
                "n_true", "n_pred", "n_hit",
                F.when(F.col("n_true") > 0,
                       F.expr("1000000 * n_hit DIV n_true"))
                .cast("bigint").alias("recall_ppm"),
                F.when(F.col("n_pred") > 0,
                       F.expr("1000000 * n_hit DIV n_pred"))
                .cast("bigint").alias("precision_ppm")))
