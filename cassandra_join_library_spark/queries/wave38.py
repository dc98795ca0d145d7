"""Round-16 wave (second): audio SNIPPET detection — windowed
sub-fingerprints and sub-clip containment, the deployment shape the
wave-36 docstring promises ("a real deployment fingerprints
overlapping windows per clip — same operator applied per window,
same join").

``mm_audio_snippet_pairs`` is the window-level match index a 100 TB
audio corpus builds for contamination/sub-clip screening: every clip
yields a STREAM of overlapping 60-bit Haitsma-Kalker sub-fingerprints
(window 122 samples, hop 61 — operators/multimodal.py
pcm_window_fingerprints, decoded in ONE bound expression per clip),
and cross-clip window pairs within Hamming 2 come from the shared
EXACT pigeonhole band join over a composite (clip, window) key —
a snippet of clip A re-encoded inside clip B surfaces as a matched
window pair at the embedding offset, which is how whole-clip
fingerprints (mm_audio_fingerprint_dedup) can NEVER find sub-clip
reuse.  The fixture plants exactly that: variant v=2 clips embed 122
samples of ANOTHER group's audio, window-aligned, so the borrower's
window 1 equals the source's window 0.

``mm_audio_snippet_recall_audit`` grades the detector clip-level:
predicted containment pairs (any matched window) versus the planted
truth (same-group variants, which always share at least the
borrow-free window 3, plus the borrower->source relation) — recall
and precision in floor ppm, the same graded-compression discipline
as the other three fingerprint audits.

At 100 TB: windowing multiplies fingerprint rows by a small constant
(clip_len/hop), everything stays map-only per clip + one banded
self-join; candidate count is bounded by band-key collisions exactly
as in the whole-clip path.  The DuckDB oracle independently rebuilds
the WAV bytes, re-extracts the samples, recomputes every window
fingerprint, and brute-forces the full (clip, window) pair space.

Reference parity: the reference library has no multimodal surface;
LLM-pipeline extension family (SURVEY.md north star).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import multimodal as M
from ..registry import register
from ..sources.catalog import load_table, spread_input

# composite-key stride: doc * _KEY_STRIDE + win encodes (clip, window)
# in one BIGINT band-join key; 4 windows per 305-sample clip, stride 8
# leaves headroom and keeps k_a < k_b equivalent to doc_a < doc_b for
# cross-clip pairs
_KEY_STRIDE = 8


def _snippet_window_fps(spark, sf_dir):
    """(doc, win, fp) windowed sub-fingerprint table over the
    synthesized snippet corpus — shared by both queries and the
    stratum script (--family snippet).  Same materialization +
    repartition rationale as the other fingerprint families."""
    docs = spread_input(
        load_table(spark, sf_dir, "documents").select("doc_id"))
    clips = M.synthesize_wav_pcm_snippets(docs, "doc_id")
    fps = M.pcm_window_fingerprints(clips, "doc_id")
    return (fps.select(F.col("doc_id").alias("doc"), "win", "fp")
            .localCheckpoint(eager=True))


def _snippet_pairs(fps):
    """Cross-clip window pairs within Hamming 2 via the composite-key
    band join.  Within-clip pairs (same doc, different windows) are
    excluded — self-similarity is a different question than reuse."""
    keyed = fps.select(
        (F.col("doc") * _KEY_STRIDE + F.col("win")).alias("doc"),
        "fp")
    pairs = D.hamming_band_pairs(keyed, bits=60, max_hamming=2,
                                 by_value=True)
    return (pairs.select(
        (F.col("doc_a") / _KEY_STRIDE).cast("bigint").alias("doc_a"),
        (F.col("doc_a") % _KEY_STRIDE).cast("bigint").alias("win_a"),
        (F.col("doc_b") / _KEY_STRIDE).cast("bigint").alias("doc_b"),
        (F.col("doc_b") % _KEY_STRIDE).cast("bigint").alias("win_b"),
        "hamming")
        .filter(F.col("doc_a") != F.col("doc_b")))


# sample -> byte -> sample round-trip rebuilt independently in DuckDB
# (the fingerprint-family grading discipline: a Spark synth/decode bug
# cannot cancel out against its own read side)
_SNIPPET_FP_CTE = """
src AS (
  SELECT doc_id, doc_id % 100 AS g, (doc_id // 100) % 3 AS v
  FROM documents
), gv AS (
  SELECT DISTINCT g, v FROM src
), smp AS (
  SELECT g, v, i.i AS i,
         CASE WHEN v = 2 AND i.i BETWEEN 61 AND 182
           THEN ('0x' || substr(md5(((g + 1) % 100) || '_' || (i.i - 61)),
                 1, 4))::BIGINT % 160 - 80
           ELSE ('0x' || substr(md5(g || '_' || i.i), 1, 4))::BIGINT
                % 160 - 80
                + CASE WHEN v = 1 AND i.i IN (14, 15) THEN 40 ELSE 0 END
         END AS s
  FROM gv, (SELECT unnest(generate_series(0, 304)) AS i) i
), built AS (
  SELECT g, v,
         '52494646' || '86020000' || '57415645' || '666d7420'
         || '10000000' || '0100' || '0100' || '803e0000' || '007d0000'
         || '0200' || '1000' || '64617461' || '62020000'
         || string_agg(
              lpad(to_hex(((s + 65536) % 65536) % 256), 2, '0')
              || lpad(to_hex(((s + 65536) % 65536) // 256), 2, '0'),
              '' ORDER BY i) AS h
  FROM smp GROUP BY g, v
), ss AS (
  SELECT d.doc_id, i.i AS i,
         (('0x' || substr(b.h, 89 + 4*i.i, 2))::BIGINT
          + 256 * ('0x' || substr(b.h, 91 + 4*i.i, 2))::BIGINT
         ) % 65536
         - CASE WHEN (('0x' || substr(b.h, 89 + 4*i.i, 2))::BIGINT
                      + 256 * ('0x' || substr(b.h, 91 + 4*i.i, 2))::BIGINT)
                     % 65536 >= 32768 THEN 65536 ELSE 0 END AS s
  FROM src d JOIN built b ON b.g = d.g AND b.v = d.v,
       (SELECT unnest(generate_series(0, 304)) AS i) i
), en AS (
  SELECT s1.doc_id, w.w AS w, k.k AS k,
         s1.s * s1.s + s2.s * s2.s AS e
  FROM (SELECT unnest(generate_series(0, 3)) AS w) w,
       (SELECT unnest(generate_series(0, 60)) AS k) k,
       ss s1, ss s2
  WHERE s1.i = w.w * 61 + 2 * k.k
    AND s2.doc_id = s1.doc_id AND s2.i = s1.i + 1
), fp AS (
  SELECT e1.doc_id, e1.w,
         CAST(SUM(CASE WHEN e2.e > e1.e THEN (1::BIGINT << e1.k)
                       ELSE 0 END) AS BIGINT) AS fp
  FROM en e1 JOIN en e2 ON e2.doc_id = e1.doc_id AND e2.w = e1.w
                       AND e2.k = e1.k + 1
  WHERE e1.k < 60
  GROUP BY 1, 2
)"""


@register("mm_audio_snippet_pairs", oracle=f"""
WITH {_SNIPPET_FP_CTE}
SELECT a.doc_id AS doc_a, CAST(a.w AS BIGINT) AS win_a,
       b.doc_id AS doc_b, CAST(b.w AS BIGINT) AS win_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 2
""")
def mm_audio_snippet_pairs(spark, sf_dir):
    """Cross-clip matched window pairs (Hamming <= 2) over windowed
    audio sub-fingerprints: the snippet-reuse index.  The planted
    v=2 borrow surfaces as (borrower win 1, source win 0); same-group
    variants surface via their identical borrow-free windows; the
    oracle brute-forces the full (clip, window) pair space to grade
    the cut exactly."""
    return _snippet_pairs(_snippet_window_fps(spark, sf_dir))


@register("mm_audio_snippet_recall_audit", oracle=f"""
WITH {_SNIPPET_FP_CTE},
pred AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.fp, b.fp)) <= 2
), truth AS (
  -- planted ground truth, clip-level: same content group (every
  -- variant pair shares at least the borrow-free window 3), or the
  -- borrower -> source relation (v=2 of group g embeds the base
  -- window 0 of group (g+1) % 100; source v in (0,1) — the wobble
  -- moves at most one frame = two bits, still inside the radius)
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM src a JOIN src b ON a.doc_id < b.doc_id
  WHERE a.g = b.g
     OR (a.v = 2 AND b.g = (a.g + 1) % 100 AND b.v IN (0, 1))
     OR (b.v = 2 AND a.g = (b.g + 1) % 100 AND a.v IN (0, 1))
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
def mm_audio_snippet_recall_audit(spark, sf_dir):
    """Clip-level containment verdicts vs planted truth: a predicted
    pair is any cross-clip pair with >= 1 matched window; truth is
    the same-group relation plus the borrower->source embedding.
    Recall here is structurally 1 (every truth pair shares an exact
    or <= 2-bit window by construction) — the MEASURED number is
    precision: how many matched-window pairs are md5-content
    coincidences rather than planted reuse, which is exactly the
    false-positive rate a production screen pays at this radius."""
    fps = _snippet_window_fps(spark, sf_dir)
    pred = (_snippet_pairs(fps)
            .select("doc_a", "doc_b").distinct())
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    lab = docs.select(
        "doc_id", (F.col("doc_id") % 100).alias("g"),
        ((F.col("doc_id") / 100).cast("bigint") % 3).alias("v"))
    a = lab.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("g_a"),
                   F.col("v").alias("v_a"))
    b = lab.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("g_b"),
                   F.col("v").alias("v_b"))
    # three EQUI-joins, not one OR-condition theta join (which would
    # be a clip-pair-space BNLJ): same group; borrower->source; its
    # mirror.  The three are disjoint by construction (a group never
    # equals its own successor mod 100 for n_groups > 1), so a plain
    # union suffices.
    t_same = a.join(b, (F.col("g_a") == F.col("g_b"))
                    & (F.col("doc_a") < F.col("doc_b")))
    t_fwd = (a.filter(F.col("v_a") == 2)
             .join(b.filter(F.col("v_b").isin(0, 1)),
                   (F.col("g_b") == (F.col("g_a") + 1) % 100)
                   & (F.col("doc_a") < F.col("doc_b"))))
    t_rev = (a.filter(F.col("v_a").isin(0, 1))
             .join(b.filter(F.col("v_b") == 2),
                   (F.col("g_a") == (F.col("g_b") + 1) % 100)
                   & (F.col("doc_a") < F.col("doc_b"))))
    truth = (t_same.select("doc_a", "doc_b")
             .unionByName(t_fwd.select("doc_a", "doc_b"))
             .unionByName(t_rev.select("doc_a", "doc_b")))
    nt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    np_ = pred.agg(F.count(F.lit(1)).cast("bigint").alias("n_pred"))
    nh = (pred.join(truth, ["doc_a", "doc_b"])
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit")))
    return (nt.crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(nh))
            .select(
                "n_true", "n_pred", "n_hit",
                F.when(F.col("n_true") > 0,
                       F.expr("1000000 * n_hit DIV n_true"))
                .cast("bigint").alias("recall_ppm"),
                F.when(F.col("n_pred") > 0,
                       F.expr("1000000 * n_hit DIV n_pred"))
                .cast("bigint").alias("precision_ppm")))
