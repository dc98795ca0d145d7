"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced with a ``noop``-format write: unlike ``count()``
(which lets Catalyst prune every unused column — a windowed projection
can "run" without evaluating the window), the noop sink computes every
output column and discards it, with no driver-side transfer.
Wall-clock includes Catalyst planning — the honest number a user sees.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

from cassandra_join_library_spark import get_spark
from cassandra_join_library_spark.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Where prior-round BENCH_r*.json records live (module-level so tests
# can point the drift cohort at a fixture dir without monkeypatching
# the process-global os.path module).
_BENCH_DIR = os.path.dirname(os.path.abspath(__file__))

HEADLINE = [
    # reference-surface core
    "join_chain3",          # chained left-deep 3-table join (J10)
    "join_composite",       # composite-key self equi-join (J7)
    "theta_lt",             # block-nested-loop theta join (J6)
    "join_full",            # full outer many-to-many (J4)
    # relational extension
    "agg_pricing_summary",  # TPC-H Q1 shape
    "topk_customers",       # agg + top-k
    "window_rank",          # ranking window
    "events_session",       # session windows
    "events_retention_cohorts",  # cohort retention (distinct + keyed join)
    # LLM-pipeline extension (oldest members rotate to TIER2 below as
    # new waves join — r14 verdict ask #3 keeps the stdout line inside
    # the driver's tail budget)
    "dedup_jaccard_capped", # stop-shingle-capped jaccard (the 100 TB knob)
    "dedup_minhash_lsh",    # minhash LSH + verify
    "corpus_e2e_pipeline",  # filter->dedup->decontam->chunk->pack capstone
    "corpus_bm25_topk",     # BM25 inverted-index retrieval (round-5 add)
    "dedup_survivors",      # pairs->clusters->keep-best materialization (round-5 add)
    "text_gopher_rules",    # rule-based quality filter, map-only (round-5 add)
    "dedup_semantic",       # hyperplane-bucketed SemDeDup (round-5 add)
    "corpus_vocabulary",    # df-banded vocab + OOV audit (round-5 wave 3)
    "dedup_tf_cosine",      # weighted n-gram cosine posting join (wave 3)
    "embedding_quantize_int8",  # int8 quantization + recon audit (wave 3)
    # round-6 additions
    "cdc_merge_upsert",      # broadcast-delta MERGE onto a snapshot
    "corpus_bpe_merges",     # BPE tokenizer training (vocab merge loop)
    "corpus_bpe_encode",     # trained-tokenizer token counting (broadcast join)
    # round-7 additions (graph_triangle_count is measured separately in
    # SCALE.md — at 11+ s on the dense sf0.1 co-purchase graph it would
    # dominate the suite and break round-over-round comparability)
    "asof_nearest_event",    # bidirectional nearest as-of match
    "dedup_prefix_key",      # prefix-fingerprint dedup (cascade rung 1)
    "text_cdc_chunks",       # content-defined chunking (map-only, wave 7)
    "events_ewma_exact",     # dyadic-weight exact EWMA window (wave 8)
    # scale-path operators
    "bloom_prefilter_join",  # constant-size bloom prune before join
    "layout_zorder",         # Morton interleave (pure codegen)
    "join_skew_salted",      # content-derived salt scatter, plain-join parity
    "string_similarity",     # PassJoin-blocked edit-distance pairs
    # round-9 additions
    "sql_q21_waiting_suppliers",  # costliest TPC-H tail (semi+anti decorrelation)
    "dedup_winnowing_pairs",  # fingerprint posting-list join (df-capped)
    "stats_rank_corr",       # contingency-table Spearman/Kendall (one corpus pass)
    "approx_topk_cms",       # Count-Min heavy hitters (d*w cells, corpus pass)
    "layout_compaction_bins",  # per-source small-file bin packing
    "mm_mp4_box_parse",      # two-level ISO-BMFF box walk (map-only)
    "dedup_url_canonical",   # canonical-URL dedup (map + one keyed agg)
    "embedding_jl_projection",  # JL sign-projection isometry audit
    "mm_subtitle_align",     # SRT round-trip + doc-keyed range join
    "corpus_span_corruption",  # T5 span-corruption planning (islands)
    "dedup_prefix_filter_jaccard",  # PPJoin prefix filter, same answer as posting join
    # round-11 additions (r11 verdict ask #3)
    "dedup_cross_snapshot",  # incremental dedup vs a persisted fingerprint store
    "approx_quantile_logbins",  # mergeable 64-row quantile sketch + shard proof
    # round-13 additions: the wave-31/32 heads joining the graded front
    "dedup_cross_snapshot_bloom",  # bloom-store prefilter cut of the store join
    "tokenizer_fertility_drift",   # tokenizer drift audit vs frozen merge table
    "mm_phash_dedup",              # image perceptual-hash near-dup (band join)
    # round-14 addition: the wave-35 head
    "corpus_contamination_bloom",  # benchmark-leak screen through the bench bloom
    # round-15 addition: the wave-36 head
    "mm_audio_fingerprint_dedup",  # audio energy-diff fingerprint near-dup (band join)
    # round-16 addition: the wave-37 head (projected@60 budget check
    # passes at 1879 chars — no TIER2 rotation needed this round)
    "mm_video_keyframe_dedup",     # MP4 keyframe aHash near-dup (frame-keyed band join)
]

# Second bench tier (r14 verdict ask #3): the oldest LLM-pipeline
# headline members, rotated out so the stdout record stays inside the
# driver's ~1,900-char tail window as new waves join the headline.
# Still measured — `SPARK_GRAFT_TIER2=1 python bench.py` runs exactly
# this list under the same warm-up/best-of-2/full-GC protocol and
# emits ONE stdout line with metric "tier2_suite_seconds"; reference
# numbers live in SCALE.md next to the rotation note.  Any of these
# can also run ad hoc via SPARK_GRAFT_ONLY.
TIER2 = [
    "dedup_jaccard_exact",  # posting-list jaccard pairs (capped twin stays tier-1)
    "dedup_passages",       # positional-gram passage (substring) dedup
    "ann_topk_bruteforce",  # embedding top-k
    "text_quality",         # text scoring
    "mm_decode_features",   # Arrow mapInPandas plumbing
    "tfidf_top_terms",      # term weighting (explode + 2 aggs + window)
    "corpus_pack_sequences",  # chunk + two-level prefix-sum packing
    "text_bigram_perplexity",  # corpus-LM perplexity filtering
    "events_first_touch",   # RANGE-window attribution
    "text_winnowing_fingerprints",  # MOSS winnowing (join twin dedup_winnowing_pairs stays tier-1)
]


def _tier2_enabled(raw: "str | None") -> bool:
    """Explicit truthy allowlist — anything else (including 'off',
    typos, or empty) means OFF, so SPARK_GRAFT_TIER2=off can never
    silently record a tier-2 run as the round's headline (r15 ADVICE:
    the old falsy-blocklist treated 'off' as ON)."""
    return (raw or "").lower() in ("1", "true", "yes", "on")


def main() -> None:
    sf_match = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else -1.0
    conditions = _bench_conditions()  # BEFORE our own JVM exists
    spark = get_spark(app_name="bench")
    queries = all_queries()

    # isolation hook: SPARK_GRAFT_ONLY="tfidf_top_terms,theta_lt" runs
    # just those queries — for separating a query's own cost from
    # suite-level interference (GC pressure, code-cache churn), and for
    # scale measurements of non-headline queries (any registered name
    # is accepted)
    only = os.environ.get("SPARK_GRAFT_ONLY")
    tier2 = _tier2_enabled(os.environ.get("SPARK_GRAFT_TIER2"))
    if only and tier2:
        # the only-list wins; say so loudly so an ad-hoc run is never
        # misattributed as the tier-2 sweep (r15 ADVICE)
        print("WARNING: SPARK_GRAFT_ONLY and SPARK_GRAFT_TIER2 are both "
              "set — the only-list wins and the tier-2 request is "
              "ignored (metric will be headline_suite_seconds)",
              file=sys.stderr)
        tier2 = False
    if only:
        headline = [q for q in only.split(",") if q in queries]
    elif tier2:
        headline = TIER2
    else:
        headline = HEADLINE

    # warm the JVM / codegen / parquet reader so timings measure query
    # execution, not session spin-up
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).count()

    # per query: one DISCARDED warm-up run (pays codegen compilation,
    # page-cache faults, JIT tiering for that plan shape), then
    # best-of-2 timed runs.  Round-over-round comparisons at best-of-2
    # still swung +/-30% on identical code (judge, round 4) — the
    # never-counted warm-up is what makes the timed runs reflect the
    # code, not the JVM's state of undress.
    timings: "dict[str, float]" = {}
    total = 0.0
    for name in headline:
        fn = queries[name]
        best = float("inf")
        # full-GC between queries: the previous query's shuffle/broadcast
        # garbage otherwise lands in THIS query's timed runs as major-GC
        # pauses — the cross-query interference that made small queries
        # drift +30-80% as the suite grew (round-5 bench)
        spark.sparkContext._jvm.System.gc()
        for i in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            if i > 0:  # run 0 is warm-up, never counted
                best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        total += timings[name]
    try:
        conditions["load1_end"] = round(os.getloadavg()[0], 2)
    except OSError:
        conditions["load1_end"] = None

    out = {
        "metric": "tier2_suite_seconds" if tier2 and not only
                  else "headline_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # bench-conditions stamp (r13 verdict ask #3): the r13 suite ran
        # 1.37x r12 with zero plan changes — host noise that took three
        # quiet-box re-runs to adjudicate.  Load average, free memory,
        # and other-JVM presence at measurement time make the next noisy
        # round self-documenting.
        "conditions": conditions,
    }

    # Drift cohort: queries whose in-suite timings climbed round over
    # round on untouched code (join_composite 1.39→2.27 s across
    # r04→r06) while a fresh-JVM isolated run stays ~1.6-1.8 s — the
    # residual single-JVM aging (heap/code-cache/listener growth) that
    # the inter-query full-GC doesn't reset.  Publish a fresh-JVM
    # best-of-2 per cohort query ALONGSIDE the suite number so the
    # honest per-query cost is on record and the aging component is
    # visible as (suite - isolated).
    #
    # The cohort is DYNAMIC (r07 verdict ask #2): every query whose
    # in-suite time moved >20% vs the previous round's BENCH_r*.json,
    # plus the two legacy drift names — so an uptick like r07's
    # corpus_e2e_pipeline +25% always ships with its isolated number
    # and the aging-vs-regression split is measured, not asserted.
    #
    # The isolated numbers go to BENCH_ISOLATED_LAST.json + stderr, NOT
    # the stdout line: the driver keeps only the stdout TAIL (~2000
    # chars), and r13's isolated_fresh_jvm field pushed the line past
    # that window — BENCH_r13.json recorded parsed:null (r13 verdict
    # ask #4).  The stdout line carries the contract fields only.
    if not only and not tier2:
        cohort = _drift_cohort(timings, sf)
        isolated = {}
        truncated = False
        # cumulative child budget: 10 fresh-JVM children at ~2 min each
        # would stack 20 min onto the suite and risk the caller's
        # timeout (each child pays full JVM spin-up + warm-ups); the
        # movers are ordered most-suspicious-first, so a cut tail loses
        # the least-interesting rows
        deadline = time.time() + 12 * 60
        for name in cohort:
            # the per-child timeout shrinks to the remaining budget —
            # a launch-time-only check would let one hung child
            # stretch the block to deadline + 600 s
            remaining = deadline - time.time()
            if remaining < 60:
                truncated = True
                print(f"drift cohort truncated at child budget: "
                      f"skipped {cohort[cohort.index(name):]}",
                      file=sys.stderr)
                break
            try:
                child = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env={**os.environ, "SPARK_GRAFT_ONLY": name},
                    capture_output=True, text=True,
                    timeout=min(600, remaining),
                )
                line = child.stdout.strip().splitlines()[-1]
                isolated[name] = json.loads(line)["queries"][name]
            except Exception:
                isolated[name] = None  # bench must still print its line
        detail = {"sf": sf, "isolated_fresh_jvm": isolated,
                  "suite_at_time": {n: timings.get(n) for n in cohort},
                  "cohort_truncated": truncated}
        print(json.dumps(detail), file=sys.stderr)
        try:
            with open(_isolated_path(sf), "w") as fh:
                json.dump(detail, fh, indent=1)
                fh.write("\n")
        except OSError:
            pass  # read-only checkout: stderr copy above still lands

    _emit(out)


def _isolated_path(sf: float) -> str:
    """Where the drift-cohort detail lands.  Only the canonical sf0.1
    run may overwrite the committed repo-root BENCH_ISOLATED_LAST.json
    — any other scale (sf0.01 iteration runs, ad-hoc probes) writes to
    .scratch/ so the committed reference keeps meaning 'the last sf0.1
    cohort' (r15 verdict ask #5)."""
    if abs(sf - 0.1) < 1e-9:
        return os.path.join(_BENCH_DIR, "BENCH_ISOLATED_LAST.json")
    scratch = os.path.join(_BENCH_DIR, ".scratch")
    os.makedirs(scratch, exist_ok=True)
    return os.path.join(scratch, "BENCH_ISOLATED_LAST.json")


def _emit(out: dict) -> None:
    """Print the ONE stdout JSON line, enforcing the driver's tail
    window: compact separators, and if the line still exceeds the
    budget, demote ``conditions`` to stderr rather than lose the whole
    record to a truncated parse (the r13 failure mode)."""
    budget = 1900  # driver keeps ~2000 chars of stdout tail
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > budget and "conditions" in out:
        print(json.dumps({"conditions": out.pop("conditions")}),
              file=sys.stderr)
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > budget:
        print(f"WARNING: bench stdout line is {len(line)} chars — the "
              f"driver's tail window may truncate it; shrink HEADLINE "
              f"or move fields to BENCH_ISOLATED_LAST.json",
              file=sys.stderr)
    print(line)


def _bench_conditions() -> dict:
    """Host-noise snapshot taken BEFORE the JVM spins up: 1-minute load
    average, available memory, and whether other JVMs are live on the
    box (the did-another-JVM-run-recently flag — concurrent JVMs were
    the r13 OOM-cascade and the prime suite-noise suspect)."""
    cond: dict = {}
    try:
        cond["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        cond["load1"] = None
    try:
        with open("/proc/meminfo") as fh:
            mem = dict(
                line.split(":", 1) for line in fh if ":" in line
            )
        cond["mem_avail_gb"] = round(
            int(mem["MemAvailable"].strip().split()[0]) / 1048576, 1)
    except (OSError, KeyError, ValueError):
        cond["mem_avail_gb"] = None
    njvm = 0
    try:
        import glob as _glob

        for comm in _glob.glob("/proc/[0-9]*/comm"):
            try:
                with open(comm) as fh:
                    if fh.read().strip() == "java":
                        njvm += 1
            except OSError:
                continue
    except OSError:
        pass
    cond["other_jvms"] = njvm  # taken pre-spin-up: ANY java here is not ours
    return cond


def _drift_cohort(timings: "dict[str, float]", sf: float) -> "list[str]":
    """Queries needing a fresh-JVM isolated number this round: the two
    legacy drift names plus every headline query whose in-suite time
    moved >20% (either direction) vs the previous round's published
    BENCH json AT THE SAME SF.  Capped at 8 extra names (largest
    movers first) to bound bench wall — a cap that triggers would
    itself be a signal worth reading in the moved list."""
    import glob

    cohort = ["join_composite", "bloom_prefilter_join"]
    benches = sorted(glob.glob(os.path.join(_BENCH_DIR, "BENCH_r*.json")))
    if not benches:
        return cohort
    try:
        with open(benches[-1]) as fh:
            prev_doc = json.load(fh)
        # the driver wraps bench output as {n, rc, sf, tail, parsed:
        # {...}} — the timings live under "parsed" there, at top level
        # when reading our own output
        if "parsed" in prev_doc and "queries" not in prev_doc:
            # The driver-captured tail can hold the stderr drift-detail
            # line (which LEADS with isolated_fresh_jvm / suite_at_time
            # numbers) BEFORE the stdout record — recover only from the
            # stdout record: the substring after the LAST '"metric":'
            # marker, falling back to the last line when truncation ate
            # the marker (the r13 shape).  Then drop any trailing
            # isolated_fresh_jvm suffix: those numbers are fresh-JVM,
            # not in-suite — they'd register as false movers.
            raw = prev_doc.get("tail", "")
            cut = raw.rfind('"metric":')
            # strip trailing newlines before the last-line fallback:
            # the r13-shape record ends with its own newline, and a
            # bare rsplit would return the empty string after it
            tail = (raw[cut:] if cut != -1
                    else raw.rstrip("\n").rsplit("\n", 1)[-1])
            tail = tail.split('"isolated_fresh_jvm"')[0]
            prev_doc = prev_doc["parsed"] or {
                # parsed:null (the r13 truncated-tail record): recover
                # what timings survive in the tail fragment — partial
                # drift coverage beats none.  sf comes from the
                # wrapper's own record, NOT the current run — the
                # cross-sf guard below must still work
                # no default: a wrapper without sf must FAIL the
                # cross-sf guard below, not inherit this run's sf
                "sf": prev_doc.get("sf"),
                # \s* accepts both the legacy spaced format (r13's
                # record) and _emit's compact separators
                "queries": {m.group(1): float(m.group(2)) for m in
                            re.finditer(r'"(\w+)":\s*([\d.]+)[,}]', tail)
                            if m.group(1) not in ("value", "sf")},
            }
        if prev_doc.get("sf") != sf:
            return cohort  # cross-sf ratios are meaningless
        prev = prev_doc.get("queries", {})
    except Exception:
        return cohort
    movers = []
    for name, now in timings.items():
        before = prev.get(name)
        if not before or before <= 0:
            continue
        ratio = now / before
        if ratio > 1.2 or ratio < 1 / 1.2:
            # upward movers (possible regressions) outrank downward
            # ones (noise receding, e.g. vs the inflated r13 suite)
            # for the capped slots
            movers.append((ratio > 1.0, abs(ratio - 1.0), name))
    movers.sort(reverse=True)
    cohort += [n for *_, n in movers[:8] if n not in cohort]
    return cohort


if __name__ == "__main__":
    main()
