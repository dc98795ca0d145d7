"""Multimodal-column queries (driver-graded).

Both are oracle-checked: the binary plumbing (encode → octet_length /
sha256) is pure SQL in DuckDB too, and the fake-decode derives all
fields deterministically from the payload (documents are ASCII, so
char positions == byte positions on the oracle side).
"""

from __future__ import annotations

from ..operators import multimodal as M
from ..registry import register
from ..sources.catalog import ensure_session_confs


def _docs(spark, sf_dir):
    ensure_session_confs(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@register("mm_binary_metadata", oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256_hex
FROM documents
""")
def mm_binary_metadata(spark, sf_dir):
    """Opaque-binary metadata extraction (length + content digest)."""
    docs = _docs(spark, sf_dir)
    payload = M.attach_binary(docs, "doc_id", "text")
    return M.binary_metadata(payload, "doc_id")


@register("mm_decode_features", oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels,
       CAST(list_sum(list_transform(generate_series(1, least(16, length(text))),
                                    i -> ascii(text[i]))) % 256 AS BIGINT) AS checksum
FROM documents
""")
def mm_decode_features(spark, sf_dir):
    """Arrow-batched (mapInPandas) stub decode of binary payloads —
    exercises the real multimodal UDF plumbing end-to-end."""
    return M.decode_features(_docs(spark, sf_dir), "doc_id", "text")
