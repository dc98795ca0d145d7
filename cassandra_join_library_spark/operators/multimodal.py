"""Multimodal (binary-column) plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched Pandas UDFs over
``mapInPandas`` — the real 100 TB pattern: bytes stay columnar through
Arrow, Python touches each batch once, partitioning is untouched.

The container has no image/audio codecs, so the decode step is a
deterministic fake (clearly marked); the Spark-side plumbing — schema,
batch shape, UDF signature — is real and oracle-tested.  Swap
``_fake_decode`` for a PIL/librosa call in production.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StructField, StructType,
)

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("channels", LongType()),
    StructField("checksum", LongType()),
])


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in payload: UTF-8 bytes of the text column as the opaque
    ``payload`` binary (in production this column arrives from the
    source: image bytes, audio frames...)."""
    return df.select(
        F.col(id_col), F.col(text_col).alias("_text"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def binary_metadata(df_with_payload: DataFrame, id_col: str) -> DataFrame:
    """Typed metadata over the opaque binary — fully JVM-side."""
    return df_with_payload.select(
        F.col(id_col),
        F.octet_length("payload").cast("bigint").alias("byte_len"),
        F.sha2(F.col("payload"), 256).alias("sha256_hex"),
    )


def _fake_decode(doc_id: int, text: str) -> "tuple[int, int, int, int, int]":
    """Deterministic fake decode (REAL CODEC NOT AVAILABLE HERE).

    A production build would do::

        raise NotImplementedError("install pillow/librosa and decode payload")

    Instead we derive stable pseudo-metadata from the payload so the
    full Arrow pipeline is exercised and oracle-checkable."""
    byte_len = len(text.encode("utf-8"))
    width = byte_len % 640
    height = (byte_len * 7) % 480
    channels = 3
    checksum = sum(ord(c) for c in text[:16]) % 256
    return byte_len, width, height, channels, checksum


def decode_features(df: DataFrame, id_col: str, text_col: str,
                    batch_hint: int = 10_000) -> DataFrame:
    """Arrow-batched decode via ``mapInPandas``: each partition streams
    pandas batches through the (stubbed) codec; output schema is typed
    and stable.  Partitioning of the input is preserved — no shuffle."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                (int(i), *_fake_decode(int(i), t))
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                decoded,
                columns=["doc_id", "byte_len", "width", "height", "channels", "checksum"],
            )

    return src.mapInPandas(decode_batches, DECODED_SCHEMA)
