"""Round-11 second wave: binary-signature (sign-bit) Hamming ANN —
the binary-embedding retrieval rung between int8 quantization
(embedding_quantize_int8) and SimHash bucketing (dedup_simhash_md5).

Extension surface (SURVEY.md §2.6).  The oracle is deliberately a
DIFFERENT physical strategy: Spark packs sign bits into BIGINT words
and scores with XOR + bit_count inside codegen, while DuckDB unnests
the raw vectors and counts differing signs per (query, neighbor) —
value equality across the two shapes is the correctness claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity as S
from ..registry import register
from ..sources.catalog import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@register("ann_hamming_topk", oracle="""
WITH signs AS (
  SELECT vec_id, t.i AS pos, (embedding[t.i] > 0) AS s
  FROM embeddings, generate_series(1, 64) t(i)
  WHERE embedding IS NOT NULL
), q AS (
  SELECT * FROM signs WHERE vec_id < 10
), ham AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(CASE WHEN q.s != c.s THEN 1 ELSE 0 END) AS BIGINT)
           AS hamming
  FROM q JOIN signs c ON c.pos = q.pos AND c.vec_id != q.vec_id
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, neighbor_id, hamming,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY hamming, neighbor_id) AS BIGINT) AS rank
  FROM ham
)
SELECT query_id, neighbor_id, hamming, rank
FROM ranked WHERE rank <= 5
""")
def ann_hamming_topk(spark, sf_dir):
    """Exact Hamming top-5 over bit-packed sign signatures
    (operators/similarity.py sign_signatures / hamming_topk): 64 float
    dims collapse to two BIGINT words per vector, distance is two
    XOR + bit_count instructions, the tiny query side broadcasts.
    At 100 TB the signature table is ~16 bytes/vector — the rerank
    primitive the SimHash pigeonhole candidates flow into."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return S.hamming_topk(emb, queries, "vec_id", "embedding",
                          k=5, dim=64)


@register("ann_hamming_recall_audit", oracle="""
WITH signs AS (
  SELECT vec_id, t.i AS pos, (embedding[t.i] > 0) AS s
  FROM embeddings, generate_series(1, 64) t(i)
  WHERE embedding IS NOT NULL
), q AS (
  SELECT * FROM signs WHERE vec_id < 10
), ham AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(CASE WHEN q.s != c.s THEN 1 ELSE 0 END) AS BIGINT)
           AS hamming
  FROM q JOIN signs c ON c.pos = q.pos AND c.vec_id != q.vec_id
  GROUP BY 1, 2
), hamk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY hamming, neighbor_id) AS rank
    FROM ham) WHERE rank <= 5
), bscored AS (
  SELECT qe.vec_id AS query_id, ce.vec_id AS neighbor_id,
         round(list_cosine_similarity(qe.embedding::DOUBLE[],
                                      ce.embedding::DOUBLE[]), 6) AS s
  FROM embeddings qe JOIN embeddings ce ON qe.vec_id != ce.vec_id
  WHERE qe.vec_id < 10
), brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY s DESC, neighbor_id ASC) AS rank
    FROM bscored) WHERE rank <= 5
)
SELECT b.query_id,
       CAST(COUNT(*) AS BIGINT) AS k_true,
       CAST(COUNT(h.neighbor_id) AS BIGINT) AS n_hits,
       CAST(CASE WHEN COUNT(*) = 0 THEN 0
            ELSE (1000000 * COUNT(h.neighbor_id)) // COUNT(*) END
            AS BIGINT) AS recall_ppm
FROM brute b LEFT JOIN hamk h
  ON h.query_id = b.query_id AND h.neighbor_id = b.neighbor_id
GROUP BY 1
""")
def ann_hamming_recall_audit(spark, sf_dir):
    """MEASURED binary-signature quality against exact ground truth —
    the wave-28 member of the recall-audit family (LSH, IVF, now
    Hamming): sign-bit top-5 joined against the exact cosine top-5,
    per-query recall in ppm.  This is the number that decides whether
    1-bit/dim compression (16 bytes/vector instead of 256) is
    acceptable for a given corpus BEFORE the 100 TB index build; on
    near-orthogonal synthetic vectors it is the worst case, which is
    exactly why it must be measured, not assumed."""
    from ..operators.stats import _RDIV

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    ham = S.hamming_topk(emb, queries, "vec_id", "embedding",
                         k=5, dim=64) \
        .select("query_id", F.col("neighbor_id").alias("ham_n"))
    brute = S.cosine_topk_bruteforce(emb, queries, "vec_id", "embedding",
                                     k=5) \
        .select("query_id", "neighbor_id")
    j = brute.join(
        ham,
        (brute["query_id"] == ham["query_id"])
        & (F.col("neighbor_id") == F.col("ham_n")),
        "left").select(brute["query_id"], "neighbor_id", "ham_n")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_true"),
        F.count("ham_n").cast("bigint").alias("n_hits"),
    ).select(
        "query_id", "k_true", "n_hits",
        F.expr(_RDIV.format(a="1000000 * n_hits", b="k_true"))
        .cast("bigint").alias("recall_ppm"))
