"""One-off stage-level timing for corpus_e2e_pipeline (r09 verdict
ask #3): the capstone's isolated wall has climbed 2.67 -> 3.33 ->
3.90 s across graded rounds; this attributes the time to a stage so
the next movement is a diff against a stage row, not a vibe.

Each stage's input is the eagerly-checkpointed output of the previous
stage, so a stage's wall is ITS OWN work only (scan + that stage's
shuffles), not a cumulative re-run.  The sum therefore slightly
overstates the fused query (which pipelines stages inside one DAG and
never materializes boundaries), and the whole-query isolated number is
printed alongside as the ground truth.

Usage: python scripts/e2e_stage_breakdown.py [--sf /root/testdata/sf0.1]
                                             [--repeat N]
Prints a markdown table ready for SCALE.md.  ``--repeat N`` runs the
whole fused query N times in the same JVM and prints each wall — this
reproduces the cold -> warm climb evidence SCALE.md cites (r10 ADVICE:
the committed tool previously ran the fused query exactly once).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the whole fused query N times in the same "
                         "JVM (cold run first, then warm runs)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cassandra_join_library_spark import get_spark
    from cassandra_join_library_spark.operators import corpus as C
    from cassandra_join_library_spark.sources.catalog import load_table

    spark = get_spark(app_name="e2e-stages")

    def ckpt(df, label, rows):
        t0 = time.time()
        out = df.localCheckpoint(eager=True)
        dt = time.time() - t0
        rows.append((label, dt, out.count()))
        return out

    # whole-query number first (fresh JVM, same session the stages
    # then reuse — stage scans after this benefit from OS page cache
    # exactly like the bench suite's steady state)
    from cassandra_join_library_spark.registry import all_queries

    walls = []
    for i in range(max(1, args.repeat)):
        t0 = time.time()
        n = all_queries()["corpus_e2e_pipeline"](spark, args.sf).count()
        walls.append(time.time() - t0)
        tag = "cold, fresh JVM" if i == 0 else f"warm run {i + 1}"
        print(f"whole query ({tag}): {walls[-1]:.2f} s, {n} rows")
    whole = walls[0]

    rows = []
    docs = ckpt(load_table(spark, args.sf, "documents")
                .select("doc_id", "lang", "text"), "0 scan documents", rows)
    kept = ckpt(
        C.quality_quantile_filter(docs, "doc_id", "text", "lang",
                                  keep_frac=0.5).select("doc_id"),
        "1 quality filter (lang window)", rows)
    surv = ckpt(docs.join(kept, "doc_id", "semi"),
                "2 survivor semi-join", rows)
    canon = ckpt(
        surv.groupBy(F.sha2(F.col("text"), 256).alias("_digest"))
        .agg(F.min("doc_id").alias("doc_id")).select("doc_id"),
        "3 exact dedup (sha2 groupBy)", rows)
    deduped = ckpt(surv.join(canon, "doc_id", "semi"),
                   "4 dedup semi-join", rows)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    contaminated = ckpt(
        C.contamination_overlap(deduped, "doc_id", "text", bench, n=3)
        .filter(F.col("is_contaminated")).select("doc_id"),
        "5 decontamination (3-gram posting join)", rows)
    clean = ckpt(deduped.join(contaminated, "doc_id", "left_anti"),
                 "6 clean anti-join", rows)
    chunks = ckpt(C.chunk_documents(clean, "doc_id", "text",
                                    size=200, stride=150),
                  "7 chunk 200/150 (map-only explode)", rows)
    t0 = time.time()
    n_packed = C.pack_sequences(chunks, budget_tokens=512).count()
    rows.append(("8 pack_sequences (prefix sum)", time.time() - t0,
                 n_packed))

    total = sum(r[1] for r in rows)
    print("\n| stage | wall (s) | output rows |")
    print("|---|---|---|")
    for label, dt, cnt in rows:
        print(f"| {label} | {dt:.2f} | {cnt:,} |")
    print(f"| sum of stages (materialized boundaries) | {total:.2f} | |")
    print(f"| whole fused query (cold, fresh JVM) | {whole:.2f} | {n:,} |")
    for i, w in enumerate(walls[1:], start=2):
        print(f"| whole fused query (warm run {i}, same JVM) | {w:.2f} | |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
