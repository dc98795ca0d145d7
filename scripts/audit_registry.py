"""Audit every registered query's physical plan for scale-unsafe
shapes (see ``plans/audit.py``) and print a findings report.

Run on demand (plan-building executes the driver actions inside
iterative/streaming queries, so the FULL sweep is a script, not a unit
test):

    python scripts/audit_registry.py [sf_dir] [--update-manifest]

Exit code 1 if any query triggers a finding that is not in the
reviewed ALLOW list below.  On a clean run with ``--update-manifest``
the swept names are written to ``tests/audit_manifest.json`` —
``tests/test_plan_audit.py`` then plan-audits only registry queries
ABSENT from that manifest, so a commit that adds a query without
re-running this sweep fails pytest instead of silently shipping an
unaudited plan (the round-6 process slip).
"""

from __future__ import annotations

import json
import pathlib
import sys

from cassandra_join_library_spark import audit_plan, get_spark
from cassandra_join_library_spark.registry import all_queries

# Reviewed exceptions: finding -> {query: justification}
ALLOW = {
    "nested_loop_join": {
        # 1-row or constant-size broadcast sides (the documented pattern)
        "corpus_bm25_topk": "1-row corpus-stats broadcast",
        "tfidf_top_terms": "1-row N-docs broadcast",
        "corpus_vocabulary": "1-row N-docs broadcast",
        "corpus_contamination": "scalar broadcast",
        "corpus_contamination_capped": "scalar broadcast",
        "corpus_e2e_pipeline": "scalar broadcast in embedded stages",
        "ann_topk_bruteforce": "broadcast query side, theta self-pair filter",
        "ann_range_search": "broadcast query side, theta self-pair filter",
        "corpus_token_budget_plan": "1-row weight-total broadcast",
        "ann_hard_negatives": "broadcast query side, label-inequality join",
        "ann_ivf_topk": "broadcast centroid set (constant size)",
        "ann_ivf_kmeans_topk": "broadcast centroid set (constant size)",
        "ann_ivf_recall_audit": "composes ann_ivf_topk + "
                                "ann_topk_bruteforce: broadcast "
                                "centroids / query side only",
        "profile_histogram_l1_drift": "two 1-row snapshot-total "
                                      "broadcasts",
        "dedup_prefix_filter_funnel": "three 1-row funnel-count "
                                      "broadcasts",
        "dedup_cross_snapshot_funnel": "two 1-row funnel-count "
                                       "broadcasts",
        "stats_randomization_test": "1-row observed-difference "
                                    "broadcast",
        "ann_pq_topk": "broadcast query side with literal codebooks",
        "embedding_cosine_pairs": "block-pair generator is a bounded literal join",
        "dedup_embedding_cosine": "same blocked pair generator",
        "theta_lt": "reference theta join IS a BNLJ by semantics",
        "theta_neq": "reference theta join IS a BNLJ by semantics",
        "theta_left_outer": "reference theta join semantics",
        "theta_right_outer": "reference theta join semantics",
        "theta_full_outer": "reference theta join semantics",
        "join_cross": "explicit cross join by definition",
        "winsorized_stats": "broadcast per-group clamp bounds",
        "weighted_sample": "scalar max-weight broadcast",
        "percentiles_exact": "scalar quantile bounds broadcast",
        "corpus_mixture": "per-language rate table (|langs| rows) broadcast",
        "text_bigram_perplexity": "1-row vocabulary-size broadcast",
        "corpus_pmi_collocations": "1-row token-count broadcast",
        "corpus_hybrid_rrf": "embedded BM25 stats broadcast + broadcast query vector",
        "profile_key_skew": "1-row global count-summary broadcast",
        "profile_fk_integrity": "three 1-row counts crossjoined per relationship",
        "ann_mutual_knn": "broadcast bounded eval slice, theta self-pair filter",
        "ann_hamming_topk": "broadcast query-signature side, theta "
                            "self-pair filter",
        "ann_hamming_recall_audit": "composes ann_hamming_topk + "
                                    "ann_topk_bruteforce: broadcast "
                                    "query sides only",
        "privacy_t_closeness": "1-row corpus-total broadcast",
        "stats_chi_square_cells": "1-row grand-total broadcast",
        "stats_autocorr_daily": "1-row mean + 1-row denominator broadcasts",
        "profile_benford_prices": "1-row digit-total broadcast",
        "events_user_lifecycle": "1-row horizon (global max month) broadcast",
        "events_cusum_drift": "1-row (sum, count) mean broadcast",
        "stats_ks_priority_price": "1-row sample-totals broadcast + "
                                   "1-row argmax join",
        "basket_association_pairs": "1-row basket-total broadcast "
                                    "(minsup prune + ppm metrics)",
        "corpus_quota_apportion": "1-row weight-total broadcast",
        "graph_rich_club": "1-row threshold/count broadcasts",
        "corpus_class_balance_downsample": "1-row minority-size "
                                           "broadcast",
        "dedup_lsh_recall_audit": "three 1-row pair-count broadcasts",
        "stats_rank_corr": "contingency-cell self-join bounded by "
                           "|X|*|Y| cells per side (never corpus^2) "
                           "+ 1-row total/stat broadcasts",
        "profile_equidepth_price": "1-row row-total broadcast",
        "approx_quantile_logbins": "3-row q-spec and 1-row total/"
                                   "mismatch broadcasts over the "
                                   "<= 64-row bin table",
        "bloom_store_fp_audit": "six 1-row audit-count broadcasts "
                                "crossjoined into the single output "
                                "row",
        "approx_percentiles": "4-row q-spec broadcast + rank-hit "
                              "theta join over the <= 64-row-per-"
                              "flag log-bin sketch state (grouped "
                              "twin of approx_quantile_logbins)",
        "mm_phash_recall_audit": "two 1-row pair-count broadcasts "
                                 "crossjoined into the single "
                                 "audit row",
        "bloom_store_rotation": "1-row flags aggregate crossjoined "
                                "with the 1-row generation sizes",
        "contamination_bloom_cut_audit": "three 1-row stat aggregates "
                                         "crossjoined into the single "
                                         "audit row",
        "mm_audio_fp_recall_audit": "two 1-row pair-count broadcasts "
                                    "crossjoined into the single "
                                    "audit row",
        "mm_video_fp_recall_audit": "two 1-row pair-count broadcasts "
                                    "crossjoined into the single "
                                    "audit row",
        "mm_audio_snippet_recall_audit": "two 1-row pair-count "
                                         "broadcasts crossjoined into "
                                         "the single audit row",
    },
    "unpartitioned_window": {
        # windows over cluster-sized frames (#partitions / #groups rows),
        # or deliberately tiny post-limit frames — never data-sized
        "corpus_global_index": "running sum over per-bucket counts",
        "corpus_stats": "share-of-total over group aggregate rows",
        "value_histogram": "bin edges over 21 bins",
        "stratified_sample": "bounded global top-k over per-stratum winners",
        "corpus_hybrid_rrf": "rank over the top-100 slice (<= 100 rows by limit)",
        "corpus_mixture_temperature": "share-of-total over #sources aggregate rows",
        "events_rfm_scores": "ntile over the per-user AGGREGATE (already "
                             "reduced); two-pass percentile-threshold join "
                             "is the documented 100 TB swap",
        "events_open_order_concurrency": "running sum over the per-DAY "
                                         "aggregate (calendar-cardinality "
                                         "rows, never the fact table)",
        "stats_autocorr_daily": "lead windows over the per-DAY aggregate "
                                "(calendar-cardinality rows, never the "
                                "fact table)",
        "skyline_pareto_parts": "running max over the distinct-price "
                                "aggregate (price-domain-bounded rows, "
                                "never the fact table)",
        "events_cusum_drift": "prefix-sum/run-min windows over the "
                              "per-DAY aggregate (calendar-cardinality "
                              "rows, never the fact table)",
        "stats_ks_priority_price": "CDF window over the distinct-value "
                                   "aggregate (price-domain-bounded "
                                   "rows, never the fact table)",
        "corpus_gini_doclen": "Lorenz window over the length-bucket "
                              "aggregate (domain-bounded rows, never "
                              "the documents table)",
        "corpus_quota_apportion": "remainder-rank window over the "
                                  "#sources-sized table",
        "graph_rich_club": "degree-CDF window over the distinct-"
                           "degree table (domain-bounded)",
        "corpus_zipf_audit": "rank window over the vocabulary "
                             "aggregate (vocab-bounded)",
        "privacy_generalize_to_k": "chosen-width window over the "
                                   "#widths-sized profile table",
        "lineitem_abc_analysis": "cumulative-revenue window over the "
                                 "part-level aggregate (dimension-"
                                 "sized, never the fact table)",
        "stats_rank_corr": "cumulative-frequency rank windows over "
                           "the distinct-value marginals (|X| and "
                           "|Y| rows, bounded domains)",
        "events_rolling_median_daily": "median + row-number windows "
                                       "over the per-DAY aggregate "
                                       "(calendar-bounded), never "
                                       "the raw event stream",
        "profile_equidepth_price": "cumulative window over the "
                                   "distinct-value table (price-"
                                   "dollar domain), never raw rows",
        "approx_topk_cms": "top-k rank window over the exact AUDIT "
                           "side's vocabulary aggregate (vocab-"
                           "bounded); the sketch path itself never "
                           "windows",
        "stats_mannwhitney_u": "cumulative-frequency window over the "
                               "distinct-dollar table (price-domain-"
                               "bounded), never the orders table",
        "approx_quantile_logbins": "cumulative window over the "
                                   "<= 64-row log-bin sketch state, "
                                   "never the orders table",
        "corpus_pack_sequences": "bucket-offset prefix window over "
                                 "the <= n_buckets(1024)-row bucket-"
                                 "totals aggregate (pack_sequences "
                                 "level 3), never the chunk table",
        "corpus_e2e_pipeline": "same pack_sequences bucket-offset "
                               "window (<= 1024 rows) in the packing "
                               "stage",
    },
    "cartesian_product": {},
    "python_udf": {},
}


MANIFEST = pathlib.Path(__file__).parent.parent / "tests" / "audit_manifest.json"


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--update-manifest"]
    update_manifest = "--update-manifest" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    spark = get_spark(app_name="audit-registry")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    clean = 0
    for name, fn in all_queries().items():
        try:
            findings = audit_plan(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 - report, don't abort
            failures.append((name, f"build error: {exc}"))
            continue
        bad = [
            k for k, hit in findings.items()
            if hit and name not in ALLOW.get(k, {})
        ]
        if bad:
            failures.append((name, ", ".join(bad)))
        else:
            clean += 1
    print(f"clean: {clean}/{clean + len(failures)}")
    for name, why in failures:
        print(f"FINDING {name}: {why}")
    if not failures and update_manifest:
        MANIFEST.write_text(
            json.dumps(sorted(all_queries()), indent=0) + "\n"
        )
        print(f"wrote {MANIFEST}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
