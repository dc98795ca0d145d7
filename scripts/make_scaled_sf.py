"""Synthesize a larger scale factor from an existing one by replication.

No sf1 directory ships with the test data, but the scaling behavior of
every headline query is the thing 100 TB readiness is judged on — so
we manufacture one: N disjoint copies of the source scale factor, each
with its key space offset by ``replica * table_rows`` (keys in the
synthetic tables are dense 0..N-1) so per-replica join cardinalities
are preserved and totals scale linearly.

Document text is word-salted per replica (``word_r3``): replicating
text verbatim would make every document a 10-way exact duplicate and
turn the near-dup pair space quadratic in the replica count — the
scaled corpus must instead look like 10 independent corpora so a
linear-time operator shows linear wall-clock.  ``n_chars`` is
recomputed to stay consistent.  region/nation stay single-copy
(TPC-H dimensions are constant across SF).

Usage:
    python scripts/make_scaled_sf.py [--src /root/testdata/sf0.1] \
        [--dst /root/repo/.scratch/sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (table, [key columns to offset by that table's own row count])
OFFSETS = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": None},  # None: max+1 pad
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
SINGLE_COPY = ["region", "nation"]


def _replicate(df: DataFrame, table: str, replicas: int,
               pads: "dict[str, int]") -> DataFrame:
    parts = []
    for r in range(replicas):
        rep = df
        for col, pad_key in OFFSETS[table].items():
            pad = pads[pad_key] if pad_key else pads[f"__max__{table}__{col}"]
            rep = rep.withColumn(col, F.col(col) + F.lit(r * pad))
        if table == "documents" and r > 0:
            salted = F.array_join(
                F.transform(F.split("text", " "),
                            lambda w: F.concat(w, F.lit(f"_r{r}"))),
                " ",
            )
            rep = rep.withColumn("text", salted) \
                     .withColumn("n_chars", F.length("text").cast("bigint"))
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.scratch/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make_scaled_sf")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS); read as long (the
        # package's load_events normalizes by value, so a plain-int64
        # round-trip is transparent to every consumer)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )

    srcs = {t: spark.read.parquet(f"{args.src}/{t}.parquet")
            for t in list(OFFSETS) + SINGLE_COPY}
    pads = {t: srcs[t].count() for t in OFFSETS}
    for t, cols in OFFSETS.items():
        for col, pad_key in cols.items():
            if pad_key is None:
                pads[f"__max__{t}__{col}"] = (
                    srcs[t].agg(F.max(col)).collect()[0][0] + 1
                )

    for t in SINGLE_COPY:
        srcs[t].write.mode("overwrite").parquet(f"{args.dst}/{t}.parquet")
        print(f"{t}: copied")
    for t in OFFSETS:
        out = _replicate(srcs[t], t, args.replicas, pads)
        if t == "events":
            # TIME-ORDERED part files (range-partition + sort on ts):
            # the streaming gate replays this table as a file stream,
            # one part file per microbatch — replicas interleave the
            # same time range, so unordered parts make everything
            # after the first file late beyond the watermark and the
            # sessionization silently drops it (found by the r12 sf1
            # sweep).  A historical replay is time-ordered in
            # production for exactly this reason.
            out = out.repartitionByRange(8, F.col("ts")) \
                     .sortWithinPartitions("ts")
        out.write.mode("overwrite").parquet(f"{args.dst}/{t}.parquet")
        if t == "events":
            # FileStreamSource replays oldest-mtime-first; parallel
            # writers finish within the same millisecond, so stamp
            # mtimes in part order (part-0000N == range partition N)
            # to pin the replay to time order deterministically
            import os
            import time

            # sort by the NUMERIC part index (lexicographic order
            # only equals index order while the index width is
            # constant); and note: mtimes are stamped from now(), so
            # a regenerated dst is NOT monotone vs a previous
            # generation — any streaming gate reading this path must
            # start from a FRESH checkpoint after regeneration
            # (r12 advice)
            parts = sorted(
                (f for f in os.listdir(f"{args.dst}/{t}.parquet")
                 if f.startswith("part-")),
                key=lambda f: int(f.split("-")[1]),
            )
            base = time.time() - 2 * len(parts)
            for i, f in enumerate(parts):
                p = f"{args.dst}/{t}.parquet/{f}"
                os.utime(p, (base + 2 * i, base + 2 * i))
        print(f"{t}: {pads[t]} -> {pads[t] * args.replicas}")


if __name__ == "__main__":
    main()
