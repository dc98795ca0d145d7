"""Bloom-filter join pruning.

The scale problem: joining a 100 TB fact table to a selective
dimension subset shuffles the ENTIRE fact side, even though only a
tiny fraction of its rows survive the join.  Spark's own runtime
row-level filtering (``spark.sql.optimizer.runtime.bloomFilter``)
injects exactly this optimization when statistics justify it; this
module is the explicit, always-available version for when the
pipeline author knows the join is selective.

Shape:

1. Build an m-bit Bloom filter over the dimension keys as a
   DISTRIBUTED aggregate — each key sets k bits; bits are OR-combined
   per 64-bit word with ``bit_or`` (associative, map-side partial
   aggregation applies).  The result is m/64 longs — CONSTANT size
   regardless of dimension cardinality — which is the one structure
   collected to the driver (same constant-size-state pattern as
   k-means centroids; README design rule 1).
2. Filter the fact side MAP-SIDE with a pure JVM expression over the
   broadcast-literal word array: k probes of
   ``element_at(words, pos/64) >> (pos%64) & 1``.  No shuffle of the
   fact table happens until after pruning.
3. Follow with the exact join: false positives (rate ~(1-e^{-kn/m})^k)
   are eliminated, so results are bit-identical to the plain join —
   the Bloom stage only removes shuffle volume.

The reference engine has no equivalent (it always materializes both
scan sides; ``/root/reference/cassandra_joinlib/hash_join.py:273-340``
hashes whatever the CQL scan returns).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_bits: int, num_hashes: int) -> "list[Column]":
    """k independent bit positions for a key: seeded xxhash64 mod m."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key: "Column | str",
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> "list[int]":
    """Aggregate the Bloom filter's 64-bit words over ``df[key]``.

    Distributed: explode each key into (word_index, mask) pairs and
    ``bit_or`` per word — one small shuffle of at most m/64 groups.
    Returns the dense word list (length m/64, missing words zero).
    """
    if num_bits <= 0 or num_bits % 64:
        # 0 passes a bare modulus check but makes the positions' pmod
        # an ANSI DIVIDE_BY_ZERO at execution; negatives likewise
        raise ValueError(
            f"num_bits must be a positive multiple of 64, got {num_bits}"
        )
    key = F.col(key) if isinstance(key, str) else key
    probes = F.array(*[
        F.struct(
            (p / 64).cast("int").alias("w"),
            # F.shiftleft only takes a literal shift; call the SQL
            # function directly to shift by a computed column
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (p % 64).cast("int")
            ).alias("mask"),
        )
        for p in _positions(key, num_bits, num_hashes)
    ])
    words = (
        df.select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.bit_or("p.mask").alias("word"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for row in words:
        dense[row["w"]] = row["word"]
    return dense


def bloom_might_contain(
    key: "Column | str",
    words: "list[int]",
    num_hashes: int = 5,
) -> Column:
    """Membership-test expression over the built filter.

    ``words`` becomes an array literal in the plan (broadcast with the
    serialized task, like any literal); the k probes are
    shift/and/element_at — all whole-stage-codegen'd, no Python."""
    key = F.col(key) if isinstance(key, str) else key
    num_bits = len(words) * 64
    lit_words = F.lit(words)
    tests = []
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        tests.append(bit == 1)
    return reduce(lambda a, b: a & b, tests)


def bloom_prefilter(
    fact: DataFrame,
    fact_key: "Column | str",
    dim: DataFrame,
    dim_key: "Column | str",
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Map-side prune ``fact`` to rows whose key MIGHT be in ``dim``.

    Superset of the exact semi-join (never drops a matching row);
    follow with the real join for exact results."""
    words = bloom_build(dim, dim_key, num_bits, num_hashes)
    return fact.filter(bloom_might_contain(fact_key, words, num_hashes))
