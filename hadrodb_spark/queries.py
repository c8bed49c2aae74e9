"""Query registry — the single source of truth behind ``__spark_entry__``.

``QUERIES`` maps a name from SURVEY.md §2's inventory to a callable
``(spark, sf_dir) -> DataFrame``; ``ORACLE`` maps the same name to the DuckDB
SQL twin (absent ⇒ the driver records a weaker rows-only check — reserved
for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadrodb_spark.operators import (
    analytics,
    asof,
    components,
    dedup,
    graph,
    kv,
    multimodal_ops,
    nativefmt,
    pipeline2,
    pipeline3,
    pipeline4,
    pipeline5,
    pipeline6,
    pipeline7,
    pipeline8,
    pipeline9,
    pipeline10,
    pipeline11,
    pipeline12,
    pipeline13,
    pipeline14,
    pipeline15,
    pipeline16,
    relational,
    relational2,
    relational3,
    relational4,
    sessionize,
    similarity,
    sketch,
    skew,
    sqlsuite,
    streamcheck,
    textops,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _register(module, only: list[str] | None = None) -> None:
    oracle = getattr(module, "ORACLE", {})
    rows_only = set(getattr(module, "ROWS_ONLY", ()))
    names = only if only is not None else list(oracle) + list(rows_only)
    for name in names:
        if name in QUERIES:
            continue
        fn = getattr(module, name)
        QUERIES[name] = fn
        if name in oracle:
            ORACLE[name] = oracle[name]


# Registration order matters: the driver verifies the FIRST 50 registry
# entries, reading the order AS COMMITTED AT END OF ROUND (proven by the
# r1-r8 CORRECTNESS key sets).  Cumulative driver coverage entering
# round 9: 276/300 — every entry that existed at round-8 START has a
# green row in some CORRECTNESS_r*.json; the 24 round-8 session-2
# additions below have never been driver-verified.
#
# ROUND-9 VERIFICATION WINDOW — positions 0-49, FROZEN at round start.
# Composition (VERDICT r8 task #1: rotate onto the 24 entries with no
# green row in ANY CORRECTNESS_r1-r8, computed from the artifacts at r9
# start — the set matches the round-8 verdict list exactly):
#   [0-23]  the 24 never-driver-verified entries: similarity
#           (ann_recall_audit, dim_truncation_recall), textops
#           (rake_keywords), pipeline4 (hybrid_rrf_fusion), pipeline13
#           (dsir_importance, bigram_xent), pipeline14 (the 10-query
#           statistical-audit tier), streamcheck (the 8 streaming-
#           equivalence rows).
#   [24-49] re-checks leading with what round-9's own diffs touch: the
#           full kv storage tier + both hadrolog rows (the cross-host
#           conditional-put commit path and the exactly-once ingest
#           fault drill rework collection.py / streaming/ingest.py this
#           round), then the standing high-value greens (q1/q9/scan/
#           dedup_near/dedup_exact/sessionize/curation_pipeline/
#           vector_topk/source_ks_shift/project_columns).
# DO NOT REORDER ANYTHING ABOVE THE "verified tiers" MARKER FOR THE REST
# OF THIS ROUND.  New round-9 queries register BELOW the window (round-10
# queue), same procedure as rounds 3-8.  After a green r9 the cumulative
# driver coverage is 300/300 — every registry entry certified at least
# once.
_register(similarity, only=["ann_recall_audit", "dim_truncation_recall"])
_register(textops, only=["rake_keywords"])
_register(pipeline4, only=["hybrid_rrf_fusion"])
_register(pipeline13)   # dsir_importance, bigram_xent
_register(pipeline14)   # chisq / mannwhitney / cusum / benford / KM /
#                         theil-sen / cohens-d / permutation / mcnemar /
#                         spearman — the statistical-audit tier
_register(streamcheck, only=[
    # the 8 round-8 streaming-equivalence rows, PINNED BY NAME so later
    # streamcheck additions cannot shift positions inside the frozen
    # round-9 window (they register at the bottom instead)
    "stream_tumbling_equivalence",
    "stream_dedup_equivalence",
    "stream_session_equivalence",
    "stream_join_equivalence",
    "stream_custom_state_equivalence",
    "stream_sink_collection_equivalence",
    "stream_sliding_equivalence",
    "stream_hadrolog_source_equivalence",
])
# positions 24-49: re-checks (see header note)
_register(kv, only=[
    "kv_history", "kv_time_travel", "kv_snapshot_diff",
    "kv_merge_equivalence", "kv_optimize_equivalence",
    "kv_export_import_roundtrip", "kv_erasure_audit", "kv_get_latest",
    "kv_delete_tombstone", "kv_ids", "kv_count", "compact_equivalence",
    "scan_skips_deleted", "where_filter",
])
_register(nativefmt, only=[
    "hadrolog_scan_decode", "hadrolog_compact_roundtrip",
])
_register(relational, only=[
    "sql_tpch_q1_like", "scan_lineitem", "project_columns",
])
_register(sqlsuite, only=["sql_tpch_q9_like"])
_register(dedup, only=["dedup_near", "dedup_exact"])
_register(sessionize, only=["sessionize"])
_register(pipeline2, only=["curation_pipeline"])
_register(similarity, only=["vector_topk"])
_register(pipeline7, only=["source_ks_shift"])
# --- verified tiers (after the window; every entry below has a green row
# in some CORRECTNESS_r1-r7) ---
_register(pipeline8)   # PSI drift, k-anonymity, embargo split, PCA, Markov
_register(pipeline9)   # dow seasonality, winsorize, Gini/HHI, MI, upsample
_register(pipeline10)  # ranker agreement, shard balance, seasonal decompose,
#                        calibration bins, Poisson bootstrap CI
_register(pipeline11)  # FK integrity, cohort LTV, vocab overlap,
#                        user entropy, exact rolling actives
_register(pipeline12)  # revenue Pareto, one-way ANOVA, ship-lag percentiles
_register(kv, only=[
    "kv_time_travel", "kv_snapshot_diff", "kv_merge_equivalence",
    "kv_optimize_equivalence", "kv_export_import_roundtrip", "kv_history",
])
_register(textops, only=["ngram_novelty"])
_register(nativefmt, only=[
    "csv_roundtrip_scan", "xml_roundtrip_scan", "jsonl_roundtrip_scan",
    "orc_roundtrip_scan",
])
_register(relational4, only=["join_interval_overlap"])
_register(pipeline7)
_register(asof, only=["asof_events_tolerance"])
_register(pipeline6)
_register(dedup, only=["dedup_incremental"])
_register(sessionize)  # funnel_conversion (green r4)
_register(relational4, only=[
    "lateral_topk", "agg_map_counts", "date_arithmetic",
    "regexp_extract_events", "agg_boolean_bitwise", "json_typed",
])
_register(asof)
_register(pipeline5)
_register(analytics)
_register(skew)
_register(relational2, only=["profile_columns"])
_register(dedup)
_register(components)
_register(similarity)
_register(pipeline5)
_register(kv)
_register(textops)
_register(pipeline2)
_register(multimodal_ops)
_register(sketch)
_register(relational3)
_register(graph)
_register(nativefmt)
_register(pipeline3)
_register(sqlsuite)
_register(pipeline4)
_register(relational4)
_register(relational)
_register(relational2)
_register(pipeline7)  # round-6 queue, session-3 additions
# --- ROUND-10 QUEUE marker: the old round-9 queue (the 24 entries) was
# rotated INTO the round-9 window above.  New round-9 queries register
# from here DOWN; collect them BY NAME at round-10 start (same
# procedure: `name in queries.QUERIES` guards collisions).
# Round-10 queue so far:
#   vector_topk_filtered (similarity.py — filtered vector search with
#   plan-pinned label pushdown; lands MID-REGISTRY via the wholesale
#   similarity register — collect BY NAME)
#   kruskal_wallis_value, kendall_tau_censored,
#   levene_variance_homogeneity, conformal_coverage_audit,
#   embedding_pair_cosine_hist (pipeline15.py — statistical-audit
#   tier 2: k-group rank ANOVA, grid-based tau-b concordance,
#   variance-homogeneity gate, split-conformal calibration audit,
#   embedding-collapse diagnostic)
#   cochran_q_gates, readability_flesch, jackknife_source_sensitivity,
#   autocorr_lag_grid (pipeline15.py batch 2 — k-gate paired test,
#   Flesch readability gate, leave-one-source-out mean sensitivity,
#   7-lag ACF profile)
#   graph_degree_assortativity, graph_kcore (graph.py — degree-mixing
#   Pearson + unrolled 3-core peeling; land MID-REGISTRY via the
#   wholesale graph register — collect BY NAME)
#   gate_phi_matrix, mixture_ess (pipeline15.py batch 3 — gate-redundancy
#   phi coefficients, effective-sample-size weighting audit)
#   bowker_symmetry, markov_entropy_rate, mann_kendall_trend,
#   runs_test_updown, cramers_v_priority_status, welch_t_value,
#   quantile_profile_sources, token_budget_pack (pipeline16.py —
#   statistical-audit tier 3 + curation: transition-matrix symmetry /
#   predictability, calendar-grid trend + runs tests, categorical effect
#   size, unequal-variance t, per-source quantile drift profile, greedy
#   token-budget packing)
#   graph_clustering_coefficient, graph_adamic_adar_topk (graph.py —
#   triangle-density ppm + link prediction; land MID-REGISTRY via the
#   wholesale graph register — collect BY NAME)
#   seasonal_strength_weekly, hill_tail_alpha, hurst_rescaled_range,
#   changepoint_binseg, cochran_armitage_trend, markov_absorbing_funnel
#   (pipeline16.py batches 3-4 — STL strength over the certified
#   decompose, Hill tail index, R/S long-memory, 2-level binary
#   segmentation, ordered-proportion trend, absorbing-chain funnel)
#   capture_recapture_dedup (dedup.py — Chapman coverage estimate from
#   the LSH + SimHash catchers; lands MID-REGISTRY via the wholesale
#   dedup register — collect BY NAME)
#   l_diversity_audit, t_closeness_audit (pipeline16.py privacy tier —
#   distinct/entropy l-diversity and ordinal-EMD t-closeness over the
#   customer QI groups, completing k_anonymity_audit)
#   ann_nprobe_recall_curve (similarity.py — nprobe↔recall tuning sweep
#   over the certified label-cell IVF plan; lands MID-REGISTRY via the
#   wholesale similarity register — collect BY NAME)
_register(pipeline15)
_register(pipeline16)
# streamcheck's window register above is name-pinned, so the 9th
# streaming row lands HERE (round-10 queue):
#   stream_late_drop_equivalence — watermark late-data drop + cross-
#   restart dedup state, the one watermark behavior complete-mode rows
#   can't certify
_register(streamcheck, only=["stream_late_drop_equivalence"])



def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return relational.sql_tpch_q1_like(spark, sf_dir)
