"""Similarity-search queries over the ``embeddings`` table.

The synthetic vectors are near-orthogonal (max pairwise cosine ≈ 0.51
at sf0.01), so pair thresholds are set at 0.4 to exercise real result
sets.  Oracle cosine uses ``list_cosine_similarity`` over DOUBLE[]
with both sides rounded to 6 decimals; the Spark side folds the dot
product sequentially in doubles, so rounded values agree.

``ann_lsh_cosine`` (hyperplane LSH) is approximate by construction →
rows-only check (the exact twin ``ann_topk_bruteforce`` carries the
oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity as S
from ..registry import register
from ..sources.catalog import load_table
from ..sources.catalog import ensure_session_confs


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@register("ann_topk_bruteforce", oracle="""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS cosine_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 10
), ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, neighbor_id ASC)
              AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine_sim
FROM ranked WHERE rank <= 5
""")
def ann_topk_bruteforce(spark, sf_dir):
    """Exact top-5 cosine neighbors for query vectors (vec_id < 10):
    broadcast queries x streamed corpus, no corpus shuffle."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return S.cosine_topk_bruteforce(emb, queries, "vec_id", "embedding", k=5)


@register("embedding_cosine_pairs", oracle="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 6) >= 0.4
""")
def embedding_cosine_pairs(spark, sf_dir):
    """Embedding pairs with cosine >= 0.4, exact, via the BLOCKED
    pair-space plan (hash-block equi-join, no cartesian/BNLJ) —
    distributes the unavoidable Θ(n²) dot products over B²/2 uniform
    tasks with bounded memory.  LSH variant below is the sub-quadratic
    near-dup path."""
    return S.cosine_pairs_blocked(
        _emb(spark, sf_dir), "vec_id", "embedding", threshold=0.4
    )


@register("dedup_embedding_cosine", oracle="""
WITH RECURSIVE sim AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]), 6) >= 0.4
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM sim
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM sim
), reach AS (
  SELECT src AS a, src AS b FROM edges
  UNION
  SELECT r.a, e.dst AS b
  FROM reach r JOIN edges e ON r.b = e.src
)
SELECT a AS vec_id, MIN(b) AS cluster_id
FROM reach GROUP BY a
""")
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup dedup: blocked exact cosine pairs at
    the threshold -> connected components -> (vec_id, cluster_id)
    canonical-representative assignment.  The pair stage is the
    hash-block equi-join (no cartesian), the clustering is iterative
    min-label propagation — both the scale-safe plans already graded
    under ``embedding_cosine_pairs`` / ``dedup_clusters``; this entry
    is their composition, the actual "drop near-dup embeddings"
    pipeline a training-data run would execute.  Oracle: recursive
    transitive-closure CTE over the same pair predicate."""
    from ..operators import dedup as D

    pairs = S.cosine_pairs_blocked(
        _emb(spark, sf_dir), "vec_id", "embedding", threshold=0.4
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return D.duplicate_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@register("ann_ivf_topk", oracle="""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding FROM embeddings WHERE vec_id % 32 = 0
), c_rank AS (
  SELECT e.vec_id AS neighbor_id, c.cent_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                 c.embedding::DOUBLE[]), 6) DESC,
                    c.cent_id ASC) AS rn
  FROM embeddings e CROSS JOIN cent c
), c_assign AS (
  SELECT neighbor_id, cent_id AS list_id FROM c_rank WHERE rn = 1
), q_rank AS (
  SELECT e.vec_id AS query_id, c.cent_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                 c.embedding::DOUBLE[]), 6) DESC,
                    c.cent_id ASC) AS rn
  FROM embeddings e CROSS JOIN cent c
  WHERE e.vec_id < 10
), q_assign AS (
  SELECT query_id, cent_id AS list_id FROM q_rank WHERE rn <= 4
), cand AS (
  SELECT DISTINCT q.query_id, ca.neighbor_id
  FROM q_assign q JOIN c_assign ca USING (list_id)
  WHERE q.query_id <> ca.neighbor_id
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_cosine_similarity(qe.embedding::DOUBLE[],
                                      ce.embedding::DOUBLE[]), 6) AS cosine_sim
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM ranked WHERE rank <= 5
""")
def ann_ivf_topk(spark, sf_dir):
    """IVF inverted-list top-k (deterministic centroids, nprobe=4) —
    the bounded-search scale path; recall vs brute force asserted in
    tests/test_similarity.py.  The algorithm is DETERMINISTIC (stride
    centroids, rounded-then-ranked assignment), so the oracle replays
    the exact same list assignment + probe + re-rank in SQL — a full
    value check, not a recall bound."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_topk(emb, queries, "vec_id", "embedding",
                      k=5, centroid_stride=32, nprobe=4)


def _guarded_cos(a: str, b: str) -> str:
    """NaN-proof oracle cosine: DuckDB's list_cosine_similarity yields
    NaN for a zero-norm operand and NaN sorts ABOVE all doubles, while
    the operator's try_divide yields NULL (sorts last in Spark).  The
    CASE maps the zero-norm case to NULL so both engines agree; pair
    with explicit NULLS LAST in the ORDER BY."""
    return (
        f"CASE WHEN list_dot_product({a}, {a}) > 0"
        f" AND list_dot_product({b}, {b}) > 0"
        f" THEN round(list_cosine_similarity({a}, {b}), 6) END"
    )


def _ivf_kmeans_oracle():
    from ._kmeans_sql import kmeans_centroids_cte

    cent_cos = _guarded_cos("e.embedding::DOUBLE[]", "c.embedding")
    pair_cos = _guarded_cos("qe.embedding::DOUBLE[]", "ce.embedding::DOUBLE[]")
    return (
        "WITH " + kmeans_centroids_cte(k=8, n_iter=3)
        + f""", c_rank AS (
  SELECT e.vec_id AS neighbor_id, c.cent_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY {cent_cos} DESC NULLS LAST,
                    c.cent_id ASC) AS rn
  FROM embeddings e CROSS JOIN cent c
), c_assign AS (
  SELECT neighbor_id, cent_id AS list_id FROM c_rank WHERE rn = 1
), q_rank AS (
  SELECT e.vec_id AS query_id, c.cent_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY {cent_cos} DESC NULLS LAST,
                    c.cent_id ASC) AS rn
  FROM embeddings e CROSS JOIN cent c
  WHERE e.vec_id < 10
), q_assign AS (
  SELECT query_id, cent_id AS list_id FROM q_rank WHERE rn <= 3
), cand AS (
  SELECT DISTINCT q.query_id, ca.neighbor_id
  FROM q_assign q JOIN c_assign ca USING (list_id)
  WHERE q.query_id <> ca.neighbor_id
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {pair_cos} AS cosine_sim
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
), ranked AS ("""
        + """
  SELECT query_id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine_sim DESC NULLS LAST, neighbor_id ASC)
              AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM ranked WHERE rank <= 5
"""
    )


@register("ann_ivf_kmeans_topk", oracle=_ivf_kmeans_oracle())
def ann_ivf_kmeans_topk(spark, sf_dir):
    """IVF top-k with TRAINED centroids: k-means (k=8, 3 iterations,
    deterministic) learns the inverted-list centroids, then the IVF
    probe search runs against them — the composed offline-train /
    online-search pipeline the stride-centroid default stands in for.
    The fixed-point k-means (see ``kmeans_fit``) makes the trained
    centroids SQL-reproducible, so the whole train+search composition
    carries a FULL value oracle (unrolled k-means CTEs feeding the
    same assignment/probe/re-rank SQL as ``ann_ivf_topk``); recall
    vs brute force is additionally asserted in
    tests/test_similarity.py."""
    from ..operators.corpus import kmeans_fit

    emb = _emb(spark, sf_dir)
    _, centroids = kmeans_fit(emb, "vec_id", "embedding", k=8, n_iter=3)
    from ..sources.catalog import local_frame

    cent_df = local_frame(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cent_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_topk(emb, queries, "vec_id", "embedding",
                      k=5, nprobe=3, centroids_df=cent_df)


@register("ann_lsh_cosine", oracle="""
WITH pl AS (
  SELECT t.t AS tbl, p.p AS p,
         list((('0x' || substr(md5(CAST(t.t*6+p.p AS VARCHAR) || ':' ||
                                    CAST(j.j AS VARCHAR)), 1, 15))::BIGINT
               % 2001 - 1000) / 1000.0 ORDER BY j.j) AS coeffs
  FROM (SELECT unnest(generate_series(0, 7)) AS t) t
  CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS p) p
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) j
  GROUP BY 1, 2
), sig AS (
  SELECT e.vec_id, pl.tbl,
         CAST(SUM(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
                                             pl.coeffs) > 0
                  THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS sig
  FROM embeddings e CROSS JOIN pl
  GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b
    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
), out AS (
  SELECT c.id_a, c.id_b,
         round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                      eb.embedding::DOUBLE[]), 6) AS cosine_sim
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, cosine_sim FROM out WHERE cosine_sim >= 0.4
""")
def ann_lsh_cosine(spark, sf_dir):
    """Hyperplane-LSH bucketed near-dup pairs (verified cosine >= 0.4):
    deterministic PORTABLE md5-grid hyperplanes (literal arrays in the
    plan — zero per-row hashing), candidates only from bucket
    collisions.  The whole pipeline — 48 sign bits, 8 signatures,
    bucket join, exact verify — is replayed in SQL, so this carries a
    FULL value oracle, not just a recall bound."""
    return S.lsh_cosine_pairs(
        _emb(spark, sf_dir), "vec_id", "embedding",
        dim=64, n_planes=6, n_tables=8, threshold=0.4,
    )


@register("ann_pq_topk", oracle="""
WITH normed AS (
  SELECT vec_id,
         CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])) > 0
              THEN list_transform(embedding::DOUBLE[],
                     x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                    embedding::DOUBLE[])))
              ELSE embedding::DOUBLE[] END AS nv
  FROM embeddings
), train AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS tj, nv
  FROM normed WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 16
), subs AS (
  SELECT unnest(generate_series(0, 7)) AS s
), books AS (
  SELECT subs.s, t.tj, t.nv[subs.s*8 + 1 : subs.s*8 + 8] AS bv
  FROM train t CROSS JOIN subs
), dists AS (
  SELECT n.vec_id, b.s, b.tj,
         round(list_sum(list_transform(
               list_zip(n.nv[b.s*8 + 1 : b.s*8 + 8], b.bv),
               p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)
           AS dist
  FROM normed n CROSS JOIN books b
), codes AS (
  SELECT vec_id, s, tj AS code FROM (
    SELECT vec_id, s, tj,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY dist ASC, tj ASC) AS rn
    FROM dists
  ) WHERE rn = 1
), approx AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(SUM(qd.dist), 6) AS ad
  FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) q
  JOIN codes c ON c.vec_id <> q.vec_id
  JOIN dists qd ON qd.vec_id = q.vec_id AND qd.s = c.s AND qd.tj = c.code
  GROUP BY 1, 2
), short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ad ASC, neighbor_id ASC) AS rn
    FROM approx
  ) WHERE rn <= 20
), rerank AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_dot_product(qn.nv, cn.nv), 6) AS cosine_sim
  FROM short s
  JOIN normed qn ON qn.vec_id = s.query_id
  JOIN normed cn ON cn.vec_id = s.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM rerank
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM ranked WHERE rank <= 5
""")
def ann_pq_topk(spark, sf_dir):
    """Product-quantization top-k (m=8 subspaces, 16-entry codebooks,
    ADC lookups + exact re-rank) — the memory-bound ANN path: the
    search scans m-byte codes, not raw vectors.  Every stage is
    deterministic and rounded-then-ranked, so the oracle replays the
    codebook construction, encoding, ADC shortlist, and exact re-rank
    in SQL — a full value check; recall vs brute force additionally
    asserted in tests/test_similarity.py."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return S.pq_topk(emb, queries, "vec_id", "embedding",
                     k=5, m=8, ks=16, centroid_stride=7, refine=4)
