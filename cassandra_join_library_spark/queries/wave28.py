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
