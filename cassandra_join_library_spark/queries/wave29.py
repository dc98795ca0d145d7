"""Round-11 third wave: cross-document boilerplate span coverage —
the RefinedWeb/C4-style templated-content strip step, generalized to
word-span level (the synthetic corpus has no line structure, so the
unit of boilerplate is the repeated k-gram span, which is also the
form that survives reflowed HTML at crawl scale).

Extension surface (SURVEY.md §2.6); exact-value DuckDB oracle under
the repo parity conventions (integer ppm, no float boundaries)."""

from __future__ import annotations

from ..operators.text import boilerplate_span_coverage
from ..registry import register
from ..sources.catalog import load_table


@register("text_boilerplate_coverage", oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL
), toks AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM words
), pg0 AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 7),
                i -> struct_pack(pos := i - 1,
                                 gram := array_to_string(w[i:i+7], ' '))))
           AS u
  FROM words
), pg AS (
  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM pg0
), hot AS (
  SELECT gram FROM (
    SELECT gram, COUNT(DISTINCT doc_id) AS gdf FROM pg GROUP BY 1
  ) WHERE gdf >= 2
), covered AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_covered FROM (
    SELECT DISTINCT doc_id, p FROM (
      SELECT pg.doc_id,
             unnest(generate_series(pg.pos, pg.pos + 7)) AS p
      FROM pg JOIN hot USING (gram))
  ) GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       CAST(COALESCE(c.n_covered, 0) AS BIGINT) AS n_covered,
       CAST(COALESCE(c.n_covered, 0) * 1000000 // t.n_tokens
            AS BIGINT) AS boiler_ppm
FROM toks t LEFT JOIN covered c USING (doc_id)
""")
def text_boilerplate_coverage(spark, sf_dir):
    """Per-document boilerplate span coverage: word 8-grams shared by
    >= 2 documents mark their token positions as templated; each doc
    reports (n_tokens, n_covered, boiler_ppm) — the strip-or-keep
    readout a crawl-scale curation pass makes before training
    (operators/text.py boilerplate_span_coverage).  Zero-coverage and
    sub-k docs are kept (coverage 0), so the output partitions the
    corpus exactly."""
    return boilerplate_span_coverage(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        k=8, min_df=2)
