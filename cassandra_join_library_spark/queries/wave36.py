"""Round-15 wave: audio-fingerprint dedup — the AUDIO twin of the
image perceptual-hash path (queries/wave33.py), named as the
best-paying candidate by the r13 and r14 verdicts.

``mm_audio_fingerprint_dedup`` completes the fingerprint-dedup family
across modalities: text (SimHash / MinHash / winnowing), image (aHash
over BMP pixels), and now audio — decode PCM -> energy-difference
fingerprint -> exact Hamming-radius pair join.  The fingerprint is
the sign-of-energy-difference design of Haitsma & Kalker ("A Highly
Robust Audio Fingerprint System", ISMIR 2002) minus the filterbank:
bit b is 1 iff frame b+1 carries more energy than frame b, so
amplitude wobble that does not reorder neighboring frame energies
leaves the fingerprint untouched and a re-encode lands within a small
Hamming radius of its master.

The pipeline is byte-real end to end with zero codec libraries:
spec-conformant mono 16-bit PCM WAVs WITH data chunks are synthesized
as binary payloads (operators/multimodal.py synthesize_wav_pcm_groups
— a content-group formula over md5-derived samples plants exact
duplicates, one-frame "re-encode" wobbles, and four-frame edits whose
fingerprints usually, not always, leave the radius), the
122 samples are read back by hex-offset arithmetic, 61 two-sample
frame energies feed the 60-bit fingerprint (inside a signed 64-bit
integer, so any SQL engine replays it), and pairs within Hamming <= 2
come from the EXACT pigeonhole chunk join shared with SimHash and
pHash (operators/dedup.py hamming_band_pairs) — never the n² pair
space.  The DuckDB oracle rebuilds the same WAV bytes with
from_hex/string_agg, re-parses them, and brute-forces all pairs, so
encode, decode, fingerprint, and radius semantics are all
value-graded.

At 100 TB: synthesis is replaced by reading the real audio bytes; the
decode+fingerprint stays map-only per clip (a real deployment
fingerprints overlapping windows per clip — same operator applied per
window, same join), fingerprints are 8 bytes per clip, and the chunk
join's candidate count is bounded by band-key collisions — the same
scaling contract as mm_phash_dedup and dedup_simhash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import multimodal as M
from ..registry import register
from ..sources.catalog import load_table, spread_input

# 44-byte PCM WAV header for 122 mono 16-bit samples at 16 kHz
# (RIFF size 280, fmt chunk 16, PCM=1, ch=1, rate 16000, byte rate
# 32000, block align 2, bits 16, data size 244) — matches
# synthesize_wav_pcm_groups byte for byte
_WAV_HDR = ("52494646" "18010000" "57415645" "666d7420" "10000000"
            "0100" "0100" "803e0000" "007d0000" "0200" "1000"
            "64617461" "f4000000")


def _audio_fingerprints(spark, sf_dir):
    """(doc, fp) energy-difference fingerprint table over the
    synthesized WAV corpus — shared by both queries, the sf1 stratum
    self-check, and the pinned exactness test.

    Materialized (localCheckpoint) before any self-join: the
    synth+decode expression tree left in the lineage would be
    re-derived on both sides of the band join (the wave-33 lesson:
    153 s for 500 rows uncut, 1.5 s cut).

    Repartitioned BEFORE the per-clip decode: the sf fixtures are one
    small parquet file -> one input split, and the hex-offset decode
    is the CPU cost the query measures (~2 ms/clip) — on one task it
    serializes (10.6 s for 5k clips; ~1.5 s spread over the cores).
    A real audio corpus gets this parallelism from its file splits;
    the explicit repartition stands in for exactly that."""
    docs = spread_input(
        load_table(spark, sf_dir, "documents").select("doc_id"))
    wav = M.synthesize_wav_pcm_groups(docs, "doc_id")
    fps = M.pcm_energy_diff_fingerprint(wav, "doc_id")
    return (fps.select(F.col("doc_id").alias("doc"), "fp")
            .localCheckpoint(eager=True))


@register("mm_audio_fingerprint_dedup", oracle=f"""
WITH src AS (
  SELECT doc_id, doc_id % 100 AS g, (doc_id // 100) % 3 AS v
  FROM documents
), smp AS (
  SELECT doc_id, i.i AS i,
         (('0x' || substr(md5(g::VARCHAR || '_' || i.i::VARCHAR),
                          1, 4))::BIGINT % 160 - 80
          + CASE WHEN v = 1 AND i.i IN (14, 15) THEN 40
                 WHEN v = 2 AND i.i IN (40, 41, 60, 61, 80, 81,
                                        100, 101) THEN 40
                 ELSE 0 END + 65536) % 65536 AS u16
  FROM src, (SELECT unnest(generate_series(0, 121)) AS i) i
), built AS (
  SELECT doc_id, from_hex('{_WAV_HDR}' || string_agg(
      lpad(to_hex(u16 % 256), 2, '0')
      || lpad(to_hex(u16 // 256), 2, '0'), '' ORDER BY i)) AS payload
  FROM smp GROUP BY doc_id
), hx AS (
  SELECT doc_id, hex(payload) AS h,
         (('0x' || substr(hex(payload), 81, 2))::BIGINT
          + 256 * ('0x' || substr(hex(payload), 83, 2))::BIGINT
          + 65536 * ('0x' || substr(hex(payload), 85, 2))::BIGINT
          + 16777216 * ('0x' || substr(hex(payload), 87, 2))::BIGINT)
         // 2 AS n_samples
  FROM built
), dsmp AS (
  SELECT doc_id, i.i AS i,
         ('0x' || substr(h, 89 + 4*i.i, 2))::BIGINT
         + 256 * ('0x' || substr(h, 91 + 4*i.i, 2))::BIGINT AS su
  FROM hx, (SELECT unnest(generate_series(0, 121)) AS i) i
  WHERE n_samples >= 122
), sgn AS (
  SELECT doc_id, i,
         su - CASE WHEN su >= 32768 THEN 65536 ELSE 0 END AS s
  FROM dsmp
), en AS (
  SELECT doc_id, i // 2 AS f, SUM(s * s) AS e
  FROM sgn GROUP BY doc_id, i // 2
), fp AS (
  SELECT e1.doc_id,
         CAST(COALESCE(SUM(CASE WHEN e2.e > e1.e
              THEN (1::BIGINT << e1.f::INT) ELSE 0 END), 0)
           AS BIGINT) AS fp
  FROM en e1 JOIN en e2 ON e2.doc_id = e1.doc_id AND e2.f = e1.f + 1
  WHERE e1.f < 60
  GROUP BY e1.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 2
""")
def mm_audio_fingerprint_dedup(spark, sf_dir):
    """Audio near-dup pairs by energy-difference fingerprint
    (Hamming <= 2) over real WAV payloads: synthesize -> byte-decode
    -> integer frame energies -> 60-bit sign fingerprint -> exact
    pigeonhole band join.  The content-group fixture plants exact
    duplicates (identical bytes), one-frame re-encode wobbles
    (Hamming <= 2 — often 0, when the wobble doesn't reorder the two
    energies it touches), and four-frame edits that leave the radius
    for ~half the groups and must pair exactly when they don't — the
    oracle rebuilds the bytes and brute-forces the full pair space to
    grade exactly that cut."""
    fps = _audio_fingerprints(spark, sf_dir)
    return D.hamming_band_pairs(fps, bits=60, max_hamming=2)


# formula-direct fingerprint (no byte rebuild) for the audit oracle —
# the dedup oracle above already grades byte-encode/decode parity
_AUDIO_FP_CTE = """
src AS (
  SELECT doc_id, doc_id % 100 AS g, (doc_id // 100) % 3 AS v
  FROM documents
), smp AS (
  SELECT doc_id, i.i AS i,
         ('0x' || substr(md5(g::VARCHAR || '_' || i.i::VARCHAR),
                         1, 4))::BIGINT % 160 - 80
         + CASE WHEN v = 1 AND i.i IN (14, 15) THEN 40
                WHEN v = 2 AND i.i IN (40, 41, 60, 61, 80, 81,
                                       100, 101) THEN 40
                ELSE 0 END AS s
  FROM src, (SELECT unnest(generate_series(0, 121)) AS i) i
), en AS (
  SELECT doc_id, i // 2 AS f, SUM(s * s) AS e
  FROM smp GROUP BY doc_id, i // 2
), fp AS (
  SELECT e1.doc_id,
         CAST(COALESCE(SUM(CASE WHEN e2.e > e1.e
              THEN (1::BIGINT << e1.f::INT) ELSE 0 END), 0)
           AS BIGINT) AS fp
  FROM en e1 JOIN en e2 ON e2.doc_id = e1.doc_id AND e2.f = e1.f + 1
  WHERE e1.f < 60
  GROUP BY e1.doc_id
)"""


@register("mm_audio_fp_recall_audit", oracle=f"""
WITH {_AUDIO_FP_CTE},
pred AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.fp, b.fp)) <= 2
), truth AS (
  -- planted ground truth: same content group, and either both sides
  -- are the master/wobble variants (v in 0,1) or the same variant
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
def mm_audio_fp_recall_audit(spark, sf_dir):
    """Measured audio-fingerprint quality against planted ground
    truth: the Hamming<=2 pair set (the exact band join) versus the
    fixture's known duplicate structure (same content group,
    master/wobble variants or identical bytes) — recall and precision
    in floor ppm.  The energy-difference fingerprint is robust by
    construction (recall hits 1 on this fixture: the wobble rarely
    reorders both touched comparisons), but precision < 1 — sparse
    60-bit sign patterns collide across groups at small radii — and
    the measured number (not the assumption) is what sets the radius
    / verify budget for a real audio corpus.  Same family as
    mm_phash_recall_audit / dedup_lsh_recall_audit: the compression
    trade is graded, never presumed.  Truth side is formula-bounded
    (group-sized join, never the clip pair space); predicted side is
    the banded join."""
    fps = _audio_fingerprints(spark, sf_dir)
    pred = D.hamming_band_pairs(fps, bits=60, max_hamming=2) \
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
