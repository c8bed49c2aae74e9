#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing is end-to-end per query (plan + execute + collect), after a one-query
JVM warmup. Queries cover every operator family: scan, joins, aggs, windows,
top-k, set ops, text, dedup (exact + MinHash LSH), vectors, and the Pandas
UDF path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadrodb_spark.queries import QUERIES
from hadrodb_spark.session import get_spark

HEADLINE = [
    "sql_tpch_q1_like",
    "scan_lineitem",
    "join_inner",
    "join_multiway",
    "agg_groupby",
    "agg_distinct",
    "window_running_sum",
    "topk_per_group",
    "setop_except",
    "scalar_json_props",
    "text_stats",
    "dedup_exact",
    "dedup_near",
    "vector_topk",
    "multimodal_features",
    # round 2 additions — totals are NOT comparable to BENCH_r01 (15 queries)
    # without subtracting these four
    "tfidf_top_terms",
    "contamination_ngram",
    "vector_topk_sq",
    "curation_pipeline",
    # round 2 late additions (pipeline3 tier) — subtract these three as well
    # when comparing totals across rounds
    "unigram_logprob",
    "anomaly_zscore",
    "vector_topk_batch",
    # restart-round additions — subtract for cross-round total comparisons
    "sketch_countmin",
    "bpe_train_merges",
    "rag_context_pack",
    "basket_lift",
    "sql_tpch_q9_like",
    # round 4 additions — subtract for cross-round total comparisons
    # (r01/r02/r03 subtotal fields below stay prefix-based and comparable)
    "asof_orders_events",
    "asof_events_tolerance",
    "window_rolling_median",
    # round-4 session-2 additions (pipeline6 tier) — subtract for
    # cross-round total comparisons; prefix subtotals stay comparable
    "peak_concurrency",
    "dedup_subdoc_chunks",
    "collocation_pmi",
    "rolling_7d_active_users",
    "weighted_sample_ares",
    "sketch_frequent_items",
    "semdedup_within_label",
    "char_entropy_gate",
    "curation_funnel_v2",
    "bitmap_daily_distinct",
    # round-5 session-3 additions (pipeline7 audit tier) — subtract for
    # cross-round total comparisons; prefix subtotals stay comparable
    "split_leakage_audit",
    "source_ks_shift",
    "fragment_stitch",
    "fuzzy_title_match",
    "embedding_quality_join",
    # round-6 additions — subtract for cross-round total comparisons;
    # prefix subtotals stay comparable
    "sql_recursive_copurchase",
    "drift_psi_monthly",
    "temporal_split_embargo",
    "vector_topk_ivfpq",
    "multimodal_phash_neardup",
    # round-6 session-2 additions (pipeline9 + pipeline10 tiers) —
    # subtract for cross-round total comparisons; prefix subtotals stay
    # comparable
    "seasonal_dow_index",
    "winsorized_stats",
    "source_concentration",
    "gate_mutual_information",
    "upsample_epochs",
    "ranker_overlap_topk",
    "shard_balance",
    "seasonal_decompose_daily",
    "score_calibration_bins",
    "poisson_bootstrap_ci",
    "fk_integrity_audit",
    "cohort_ltv_curve",
    "dedup_threshold_curve",
    "source_vocab_overlap",
    "user_entropy_histogram",
    "kv_erasure_audit",
    "dau_wau_mau",
    "revenue_pareto_curve",
    "anova_value_by_type",
    "ship_lag_percentiles",
    # round-8 additions — subtract for cross-round total comparisons;
    # prefix subtotals stay comparable
    "ann_recall_audit",
    "dsir_importance",
    "bigram_xent",
    "dim_truncation_recall",
    "stream_tumbling_equivalence",
    "stream_dedup_equivalence",
    "stream_session_equivalence",
    "stream_join_equivalence",
    "stream_custom_state_equivalence",
    "stream_sink_collection_equivalence",
    # round-8 session-2 additions (pipeline14 statistical-audit tier) —
    # subtract for cross-round total comparisons; prefix subtotals stay
    # comparable (appended AFTER the streaming block to keep every
    # existing prefix identical)
    "chisq_independence",
    "mannwhitney_shift",
    "cusum_changepoint",
    "benford_first_digit",
    "survival_km_daily",
    "stream_sliding_equivalence",
    "theil_sen_slope",
    "cohens_d_by_type",
    "hybrid_rrf_fusion",
    "rake_keywords",
    "permutation_test_diff",
    "mcnemar_gate_disagreement",
    "spearman_rank_corr",
    "stream_hadrolog_source_equivalence",
    # round-9 additions (pipeline15 statistical-audit tier 2) — subtract
    # for cross-round total comparisons; prefix subtotals stay comparable
    "kruskal_wallis_value",
    "kendall_tau_censored",
    "levene_variance_homogeneity",
    "conformal_coverage_audit",
    "embedding_pair_cosine_hist",
    "vector_topk_filtered",
    "cochran_q_gates",
    "readability_flesch",
    "jackknife_source_sensitivity",
    "autocorr_lag_grid",
    "graph_degree_assortativity",
    "graph_kcore",
    "gate_phi_matrix",
    "mixture_ess",
    # round-9 session-3 additions (pipeline16 statistical-audit tier 3 +
    # graph/curation batch) — appended AFTER everything else so every
    # existing prefix subtotal stays comparable across rounds
    "bowker_symmetry",
    "markov_entropy_rate",
    "mann_kendall_trend",
    "runs_test_updown",
    "cramers_v_priority_status",
    "welch_t_value",
    "quantile_profile_sources",
    "token_budget_pack",
    "graph_clustering_coefficient",
    "graph_adamic_adar_topk",
    "seasonal_strength_weekly",
    "hill_tail_alpha",
    "hurst_rescaled_range",
    "changepoint_binseg",
    "cochran_armitage_trend",
    "markov_absorbing_funnel",
    "capture_recapture_dedup",
    "stream_late_drop_equivalence",
    "l_diversity_audit",
    "t_closeness_audit",
    "ann_nprobe_recall_curve",
    # round-10 additions — subtract for cross-round total comparisons;
    # prefix subtotals stay comparable
    "stream_left_join_equivalence",
    # round-11 additions
    "stream_session_sink_equivalence",
    # round-12 additions (END only — prefix subtotals compared across rounds)
    "compact_range_equivalence",
    "stream_join_sink_equivalence",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hadrodb_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer caches + Python UDF worker pool (so the
    # pandas-path queries measure compute, not interpreter spawn)
    QUERIES["scan_lineitem"](spark, sf_dir).count()
    import pandas as _pd

    spark.range(8).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    # cold = first run, warm = second run (steady state). Both are reported;
    # "value" is the WARM total: on this hypervisor, cold timings correlate
    # 0.7-0.9 with CPU steal bursts (measured over 18 full sequences —
    # outliers up to 50s on a 0.5s query under host contention), so the warm
    # number is the one that tracks the code rather than the neighbours.
    # steal_pct below records contention observed DURING this run so an
    # outlier is attributable.
    def cpu_stat() -> tuple[int, int]:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return sum(v), v[7]  # (total jiffies, steal jiffies)

    t_all0, s_all0 = cpu_stat()
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    best: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        n = 0
        # 3 runs: cold, warm (FIELD SEMANTICS UNCHANGED since r1 — always
        # the second run), and one more warm sample. warm_best = min of the
        # two warm runs — host-jitter immunity WITHOUT changing any
        # pre-existing field's meaning: on this hypervisor a straggler task
        # in one 32-way stage can triple a multi-stage query's wall time
        # (measured: same query, same session, 1.3s-15.3s across runs with
        # steal < 1%), and min-of-2 is the cheapest estimator that mostly
        # discards such one-off stalls.
        for _ in range(3):
            t0 = time.perf_counter()
            n = QUERIES[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        cold[name] = round(runs[0], 3)
        warm[name] = round(runs[1], 3)
        best[name] = round(min(runs[1:]), 3)
        print(
            f"# {name}: cold {cold[name]:.3f}s / warm {warm[name]:.3f}s"
            f" / best {best[name]:.3f}s ({n} rows)",
            file=sys.stderr,
        )
    t_all1, s_all1 = cpu_stat()
    steal_pct = round(100.0 * (s_all1 - s_all0) / max(t_all1 - t_all0, 1), 2)

    # Best-of-passes protocol (round-9 verdict task #3): the r8 committed
    # artifact ran under steal 0.6% and drifted everything ~1.4× vs the
    # builder's calm runs — a single measurement window holds the whole
    # round hostage.  So ALWAYS take at least one more FULL warm pass,
    # minutes apart from the first, folding each query's time into `best`
    # (per-query min across passes), and record each pass's own steal so
    # readers can see which window produced the mins.  If every pass so
    # far was noisy (>2% steal), take one extra pass (bounded at 3 total).
    # WARM FIELD SEMANTICS STAY FROZEN (always pass 1's second run);
    # `best` is the field cross-round comparisons should use.
    pass_steal_pct = [steal_pct]
    extra_passes = 1
    while extra_passes <= 2:
        t_r0, s_r0 = cpu_stat()
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            best[name] = round(min(best[name], time.perf_counter() - t0), 3)
        t_r1, s_r1 = cpu_stat()
        pass_steal_pct.append(
            round(100.0 * (s_r1 - s_r0) / max(t_r1 - t_r0, 1), 2)
        )
        extra_passes += 1
        if min(pass_steal_pct) <= 2.0:
            break
    # `noisy` labels the pass the WARM fields came from: later passes only
    # refresh `best` (warm's second-run semantics are frozen since r1), so
    # a calm later pass must NOT clear the flag — value / r01 / r02 warm
    # totals still carry the first window.  retry_steal_pct keeps its
    # pre-r9 meaning (steal during the first extra pass).
    retry_steal_pct = pass_steal_pct[1]
    noisy = steal_pct > 2.0

    total_cold = round(sum(cold.values()), 3)
    total_warm = round(sum(warm.values()), 3)
    # BENCH_r01 covered only the first 15 queries, BENCH_r02 the first 27;
    # emit those subsets' warm totals (permanent fields) so cross-round
    # comparisons stay one-line computable as the list grows append-only.
    r01_subset = round(sum(warm[n] for n in HEADLINE[:15]), 3)
    r02_subset = round(sum(warm[n] for n in HEADLINE[:27]), 3)
    totals = {
        "metric": "headline_queries_total_runtime",
        "value": total_warm,
        "unit": "sec",
        "sf": sf,
        "total_cold": total_cold,
        "total_warm_best": round(sum(best.values()), 3),
        "r01_comparable_warm_total": r01_subset,
        "r02_comparable_warm_total": r02_subset,
        "r01_comparable_warm_best_total": round(
            sum(best[n] for n in HEADLINE[:15]), 3
        ),
        "r02_comparable_warm_best_total": round(
            sum(best[n] for n in HEADLINE[:27]), 3
        ),
        "steal_pct": steal_pct,
        "retry_steal_pct": retry_steal_pct,
        "pass_steal_pct": pass_steal_pct,
        "noisy": noisy,
        "n_queries": len(HEADLINE),
    }
    # Full per-query detail (all three maps) goes to a side file: the
    # driver records only a 2000-char stdout tail, and the full line
    # outgrew it rounds ago (6.2 kB at 70 queries) — that is why
    # BENCH_r06/r07 show `parsed: null`.  The FINAL stdout line is kept
    # compact (< ~800 chars): every total/subtotal plus the warm times of
    # the 15 round-1-comparable queries, which are the only per-query
    # numbers BASELINE.md comparisons use.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {**totals, "queries": warm, "queries_cold": cold,
             "queries_warm_best": best},
            f,
            indent=1,
        )
    print(
        json.dumps(
            {**totals,
             "queries": {n: warm[n] for n in HEADLINE[:15]},
             "detail_file": "BENCH_DETAIL.json"},
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
