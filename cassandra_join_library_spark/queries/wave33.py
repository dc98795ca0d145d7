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
from ..sources.catalog import load_table


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
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = M.synthesize_bmp_pixels(docs, "doc_id", n_groups=100)
    fps = M.bmp_ahash(imgs, "doc_id")
    # materialize the fingerprint table (8 bytes/image — sketch-sized
    # state) before the self-join: with the synth+decode expression
    # tree left in the lineage, join planning re-derives the whole
    # byte pipeline on both sides (153 s for 500 rows); cut, it's
    # 1.5 s.  Same discipline as bloom_prefilter_join's words table.
    # Unlike the text simhash (whose fingerprints come out of a
    # groupBy, a natural materialization point), this pipeline is
    # map-only end to end, so the cut must be explicit.
    fps = (fps.filter(F.col("is_bmp"))
           .select(F.col("doc_id").alias("doc"), F.col("ahash").alias("fp"))
           .localCheckpoint(eager=True))
    return D.hamming_band_pairs(fps, bits=60, max_hamming=2)
