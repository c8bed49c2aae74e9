"""Plan-shape regression tests: fail if an operator's physical plan loses the
properties that make it viable at 100 TB (pushdown, pruning, broadcast,
bounded shuffles). These encode the `.explain("formatted")` review the build
contract demands."""

from __future__ import annotations

import pytest

from hadrodb_spark.operators import relational as R
from hadrodb_spark.plans import explain as E


def test_scan_pushes_filters_and_prunes_columns(spark, sf_dir):
    df = R.scan_lineitem(spark, sf_dir)
    assert E.has_pushed_filters(df), E.formatted_plan(df)
    cols = set(E.read_schema_columns(df))
    assert cols == {"l_orderkey", "l_linenumber", "l_quantity", "l_discount"}, cols


def test_flagship_prunes_to_needed_columns(spark, sf_dir):
    df = R.sql_tpch_q1_like(spark, sf_dir)
    cols = set(E.read_schema_columns(df))
    # 7 columns of 11 — shipdate filter + group keys + measures only
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols
    assert {"l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"} <= cols


def test_tfidf_no_preagg_term_shuffle(spark, sf_dir):
    """tfidf_top_terms (r4 VERDICT fix): no stage may be partitioned by bare
    ``term`` carrying row-scale pre-aggregation data — the old
    ``repartition("term")`` forfeited map-side combine and funneled each
    Zipf-head stopword's whole occurrence stream onto one executor. The
    scale-safe plan: every exchange is ENSURE_REQUIREMENTS under a partial
    aggregate, df joins back by broadcast, top-k uses WindowGroupLimit."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.pipeline2 import tfidf_top_terms

    try:
        df = tfidf_top_terms(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # no user-forced repartition anywhere (the skew-prone shape)
        assert "REPARTITION_BY_COL" not in plan, plan
        # the vocab/df relation joins back via broadcast, and rank top-k
        # prunes before the final shuffle
        assert "BroadcastHashJoin" in plan, plan
        assert "WindowGroupLimit" in plan, plan
        # every term-keyed exchange carries partial-aggregate rows: the
        # exploded Generate feeds a partial count BEFORE any exchange
        gen = plan.index("Generate explode")
        assert "partial_count" in plan[:gen], plan
    finally:
        shared.release_shared()


def test_dim_joins_broadcast(spark, sf_dir):
    assert E.has_broadcast_join(R.join_inner(spark, sf_dir))
    assert E.has_broadcast_join(R.join_range(spark, sf_dir))
    assert E.has_broadcast_join(R.join_multiway(spark, sf_dir))


def test_flagship_single_shuffle(spark, sf_dir):
    # one Exchange for the groupBy, one for the orderBy — no hidden extras
    assert E.shuffle_count(R.sql_tpch_q1_like(spark, sf_dir)) <= 2


def test_multiway_join_shuffle_bound(spark, sf_dir):
    # fact⋈orders shuffles both sides (2 Exchanges) + 1 final agg exchange;
    # broadcast dims must add none
    assert E.shuffle_count(R.join_multiway(spark, sf_dir)) <= 3


def test_wholestage_codegen_present(spark, sf_dir):
    assert E.codegen_stage_count(R.sql_tpch_q1_like(spark, sf_dir)) >= 1
    assert E.codegen_stage_count(R.agg_groupby(spark, sf_dir)) >= 1


def test_sort_limit_is_take_ordered(spark, sf_dir):
    # ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    # top-N), never a global Sort
    plan = E.formatted_plan(R.sort_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_documents_scan_prunes_for_text_ops(spark, sf_dir):
    from hadrodb_spark.operators import textops

    cols = set(E.read_schema_columns(textops.doc_fingerprint(spark, sf_dir)))
    assert cols == {"doc_id", "text"}, cols  # lang/source/n_chars pruned


def test_vector_topk_broadcasts_query_vector(spark, sf_dir):
    from hadrodb_spark.operators import similarity

    df = similarity.vector_topk(spark, sf_dir)
    plan = E.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # top-k must be TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_dedup_exact_single_aggregation_shuffle(spark, sf_dir):
    from hadrodb_spark.operators import dedup

    assert E.shuffle_count(dedup.dedup_exact(spark, sf_dir)) <= 1


def test_sessionize_shuffles_once_on_user(spark, sf_dir):
    from hadrodb_spark.operators import sessionize

    # one Exchange for the user_id window; the groupBy reuses the
    # partitioning (+1 tolerated for AQE final agg)
    assert E.shuffle_count(sessionize.sessionize(spark, sf_dir)) <= 2


def test_vector_topk_sq_scan_only_big_side(spark, sf_dir):
    """SQ-ANN must never shuffle the vector relation: the codebook and query
    broadcast, preselect+rerank are TakeOrdered. The only Exchanges allowed
    are the tiny per-dimension stats aggregation (explode→groupBy pos)."""
    from hadrodb_spark.operators import similarity as S

    df = S.vector_topk_sq(spark, sf_dir)
    plan = E.formatted_plan(df)
    assert plan.count("TakeOrderedAndProject") >= 2, plan
    assert E.has_broadcast_join(df), plan
    # stats agg: hashpartitioning(pos) + SinglePartition collapse = 2
    assert E.shuffle_count(df) <= 2, plan


def test_new_pipeline_ops_plan_shape(spark, sf_dir):
    """contamination_ngram: benchmark grams broadcast (corpus side map-only);
    stratified_sample: map-only (no Exchange at all)."""
    from hadrodb_spark.operators import pipeline2 as P

    assert E.has_broadcast_join(P.contamination_ngram(spark, sf_dir))
    assert E.shuffle_count(P.stratified_sample(spark, sf_dir)) == 0


def test_sqlsuite_plan_shapes(spark, sf_dir):
    """TPC-H-shape queries: dims broadcast, TopK is TakeOrdered, shuffles
    bounded to the fact joins + final agg."""
    from hadrodb_spark.operators import sqlsuite as Q

    q3 = Q.sql_tpch_q3_like(spark, sf_dir)
    plan3 = E.formatted_plan(q3)
    assert E.has_broadcast_join(q3), plan3
    assert "TakeOrderedAndProject" in plan3, plan3
    q5 = Q.sql_tpch_q5_like(spark, sf_dir)
    assert E.has_broadcast_join(q5), E.formatted_plan(q5)
    assert "SortMergeJoin" not in E.formatted_plan(q5)
    q18 = Q.sql_tpch_q18_like(spark, sf_dir)
    assert "TakeOrderedAndProject" in E.formatted_plan(q18)
    # Q17/Q21: correlated subqueries must decorrelate to hash joins —
    # never a per-row nested loop; dims stay broadcast.
    for name in ("sql_tpch_q13_like", "sql_tpch_q15_like",
                 "sql_tpch_q17_like", "sql_tpch_q21_like"):
        df = getattr(Q, name)(spark, sf_dir)
        plan = E.formatted_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
        assert E.has_broadcast_join(df), (name, plan)
        assert E.shuffle_count(df) <= 4, (name, plan)


def test_asof_variants_single_shuffle(spark, sf_dir):
    """All three as-of directions are the union+window idiom: exactly one
    hash Exchange on the key, never a range-join or per-row lookup; the
    nearest variant's two directional windows share that one Exchange."""
    from hadrodb_spark.operators import asof as A

    for fn in (A.asof_orders_events, A.asof_events_forward, A.asof_events_nearest):
        df = fn(spark, sf_dir)
        plan = E.formatted_plan(df)
        assert E.shuffle_count(df) == 1, (fn.__name__, plan)
        assert "CartesianProduct" not in plan, (fn.__name__, plan)


def test_fuzzy_pairs_plan_is_hash_join_not_cross(spark, sf_dir):
    """Deletion-neighborhood blocking must execute as an equi hash join on
    the variant key — never a nested-loop/cartesian over names."""
    from hadrodb_spark.operators import relational3 as R3

    plan = E.formatted_plan(R3.fuzzy_pairs_levenshtein(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pipeline3_plan_shapes(spark, sf_dir):
    from hadrodb_spark.operators import pipeline3 as P3

    # batched ANN: query side broadcast, only the rank-window shuffle
    df = P3.vector_topk_batch(spark, sf_dir)
    assert E.has_broadcast_join(df), E.formatted_plan(df)
    assert E.shuffle_count(df) <= 2, E.formatted_plan(df)
    # repetition gates: scan reads only (doc_id, text); two agg shuffles
    gates = P3.repetition_gates(spark, sf_dir)
    assert set(E.read_schema_columns(gates)) == {"doc_id", "text"}
    assert E.shuffle_count(gates) <= 2, E.formatted_plan(gates)
    # packing: exactly the one per-language window shuffle
    assert E.shuffle_count(P3.pack_greedy(spark, sf_dir)) <= 1
    # correlation matrix: single scan, global agg with map-side partials,
    # no shuffle at all beyond the 1-row final agg exchange
    cm = P3.corr_matrix(spark, sf_dir)
    assert E.shuffle_count(cm) <= 1, E.formatted_plan(cm)
    assert set(E.read_schema_columns(cm)) == set(P3._CORR_COLS)
    # gap-fill: the dense hour grid broadcasts to the user side
    assert E.has_broadcast_join(P3.time_gapfill(spark, sf_dir))


@pytest.mark.slow
def test_derived_partsupp_sqlsuite_plan_shapes(spark, sf_dir):
    """Q2/Q9/Q11/Q16/Q20 (derived-partsupp shapes): correlated subqueries
    decorrelate to hash joins — no per-row nested loop, no cartesian; dims
    stay broadcast."""
    from hadrodb_spark.operators import sqlsuite as Q

    for name in ("sql_tpch_q2_like", "sql_tpch_q9_like", "sql_tpch_q11_like",
                 "sql_tpch_q16_like", "sql_tpch_q20_like"):
        df = getattr(Q, name)(spark, sf_dir)
        plan = E.formatted_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
        assert E.has_broadcast_join(df), (name, plan)


def test_sketch_plan_shapes(spark, sf_dir):
    """Sketch builds are map-side-combinable aggs; the probe joins keep the
    tiny sketch relation on the broadcast side — never a cartesian."""
    from hadrodb_spark.operators import sketch as SK

    cms = SK.sketch_countmin(spark, sf_dir)
    plan = E.formatted_plan(cms)
    assert "CartesianProduct" not in plan, plan
    assert E.has_broadcast_join(cms), plan
    bloom = SK.sketch_bloom(spark, sf_dir)
    plan = E.formatted_plan(bloom)
    assert "CartesianProduct" not in plan, plan
    assert E.has_broadcast_join(bloom), plan


def test_graph_reachability_is_recursive_union(spark, sf_dir):
    """The BFS must compile to Spark's recursive-CTE execution (UnionLoop),
    not an unrolled join tree."""
    from hadrodb_spark.operators import graph as G

    plan = E.formatted_plan(G.graph_reachability(spark, sf_dir))
    assert "UnionLoop" in plan or "CTERelation" in plan or "Loop" in plan, plan


def test_rag_context_pack_broadcasts_queries(spark, sf_dir):
    """Retrieval broadcasts the 3 query vectors against one corpus scan;
    the pack adds only the per-query window shuffle."""
    from hadrodb_spark.operators import pipeline4 as P4

    df = P4.rag_context_pack(spark, sf_dir)
    plan = E.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert E.shuffle_count(df) <= 3, plan


def test_dedup_containment_no_quadratic_join(spark, sf_dir):
    """Containment verifies LSH candidate pairs only — the plan must stay
    equi-join (band keys), never a cartesian."""
    from hadrodb_spark.operators import dedup as D

    plan = E.formatted_plan(D.dedup_containment(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_latest_additions_plan_shapes(spark, sf_dir):
    from hadrodb_spark.operators import pipeline4 as P4
    from hadrodb_spark.operators import pipeline5 as P5
    from hadrodb_spark.operators import relational3 as R3
    from hadrodb_spark.operators import relational4 as R4

    # phrase search: posting-list equi-join, never a cartesian
    plan = E.formatted_plan(P4.phrase_search(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # weighted median: both windows share ONE hash Exchange on the group key
    assert E.shuffle_count(R4.weighted_median(spark, sf_dir)) <= 1
    # session windows: one shuffle on user_id
    assert E.shuffle_count(R3.session_window_batch(spark, sf_dir)) <= 1
    # higher moments: single agg pass (partial + final = 1 Exchange)
    assert E.shuffle_count(R4.agg_higher_moments(spark, sf_dir)) <= 1
    # bigram LM: the explode lineage is consumed once; vocab broadcasts
    df = P5.bigram_logprob(spark, sf_dir)
    plan = E.formatted_plan(df)
    # one bigram + one vocab explode; formatted plans print each node twice
    # (tree line + detail block)
    assert plan.count("Generate") <= 4, plan
    # feature hashing: two agg shuffles, no join at all
    fh = P5.feature_hashing(spark, sf_dir)
    plan = E.formatted_plan(fh)
    assert "Join" not in plan, plan


def test_basket_lift_prunes_and_broadcasts(spark, sf_dir):
    from hadrodb_spark.operators import relational4 as R4

    df = R4.basket_lift(spark, sf_dir)
    plan = E.formatted_plan(df)
    # the a-priori frequent-item prune must be a semi-join ahead of the
    # pair explode, and nothing in the graph may degrade to a cartesian
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the 1-row order total comes back via broadcast
    assert E.has_broadcast_join(df), plan
    # but the item-count relation (~20M rows at sf100) must NOT be an
    # explicit broadcast commitment — only the 1-row `tot` hint is allowed;
    # AQE may still broadcast the small side at runtime, which is the
    # gracefully-degrading shape we want
    assert E.explicit_broadcast_hint_count(df) == 1, plan


def test_round4_additions_plan_shapes(spark, sf_dir):
    """New r4 operators keep scale-safe shapes: range search is scan-only
    (broadcast query, no shuffle, no sort), the length gate is map-only
    after a broadcast 1-row threshold, the new windows/as-of stay at one
    shuffle on their partition key."""
    from hadrodb_spark.operators import asof as A
    from hadrodb_spark.operators import pipeline2 as P2
    from hadrodb_spark.operators import relational4 as R4
    from hadrodb_spark.operators import similarity as S
    from hadrodb_spark.operators import textops as T

    rs = S.ann_range_search(spark, sf_dir)
    plan = E.formatted_plan(rs)
    assert E.shuffle_count(rs) == 0, plan
    assert "Sort" not in plan and "TakeOrdered" not in plan, plan
    assert E.has_broadcast_join(rs), plan

    lg = P2.length_gate_disc(spark, sf_dir)
    plan = E.formatted_plan(lg)
    assert E.has_broadcast_join(lg), plan
    # threshold aggregate: partial + single-partition collapse only
    assert E.shuffle_count(lg) <= 2, plan

    assert E.shuffle_count(R4.window_rolling_median(spark, sf_dir)) <= 1
    assert E.shuffle_count(R4.window_first_last_ignore_nulls(spark, sf_dir)) <= 1
    assert E.shuffle_count(A.asof_events_tolerance(spark, sf_dir)) <= 1
    # vocab_coverage: explode->term agg (1) + rank-window single partition
    # (1) + final agg collapse — bounded
    assert E.shuffle_count(T.vocab_coverage(spark, sf_dir)) <= 4


def test_pipeline6_plan_shapes(spark, sf_dir):
    """Session-2 operators keep scale-safe shapes: the sweep line stays at
    bounded shuffles (spans agg + per-day window + tiny day-keyed join),
    MAD's two percentile passes are event_type-keyed aggs with no
    cartesian blowup, chunk dedup pays exactly one chunk shuffle + the
    per-doc re-agg, and the PMI join must not compile to a real cartesian
    product (its only cross join is the broadcast 1-row corpus count)."""
    from hadrodb_spark.operators import pipeline6 as P6

    pc = P6.peak_concurrency(spark, sf_dir)
    plan = E.formatted_plan(pc)
    # spans agg (1) + day window (1) + two day-keyed agg/join exchanges
    assert E.shuffle_count(pc) <= 5, plan
    assert "CartesianProduct" not in plan, plan

    am = P6.anomaly_mad(spark, sf_dir)
    plan = E.formatted_plan(am)
    assert "CartesianProduct" not in plan, plan
    # events scanned twice (median, MAD) — keyed aggs/joins only
    assert E.shuffle_count(am) <= 6, plan

    dc = P6.dedup_subdoc_chunks(spark, sf_dir)
    plan = E.formatted_plan(dc)
    # chunk-frequency window (1) + doc re-agg (1); union of planted copies
    # must not introduce extra exchanges per branch
    assert E.shuffle_count(dc) <= 3, plan

    pmi = P6.collocation_pmi(spark, sf_dir)
    plan = E.formatted_plan(pmi)
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan  # top-20 never global-sorts
    # 1-row corpus count must ride a broadcast, and only that one is hinted
    assert E.explicit_broadcast_hint_count(pmi) == 1, plan

    zs = P6.zipf_slope(spark, sf_dir)
    # term count agg + source rank window + final agg
    assert E.shuffle_count(zs) <= 3, E.formatted_plan(zs)


def test_pipeline6_batch2_plan_shapes(spark, sf_dir):
    """Weighted sampling must compile map-only + TakeOrdered (zero
    shuffles, no global sort); the daily percentile rollup is a single
    keyed aggregation; the rolling-WAU expansion stays at bounded keyed
    shuffles (distinct, grid, two-phase count_distinct) with no nested
    loop."""
    from hadrodb_spark.operators import pipeline6 as P6

    ws = P6.weighted_sample_ares(spark, sf_dir)
    plan = E.formatted_plan(ws)
    assert "TakeOrderedAndProject" in plan, plan
    assert E.shuffle_count(ws) == 0, plan

    assert E.shuffle_count(P6.latency_percentiles_daily(spark, sf_dir)) <= 1

    r7 = P6.rolling_7d_active_users(spark, sf_dir)
    plan = E.formatted_plan(r7)
    assert E.shuffle_count(r7) <= 5, plan
    assert "CartesianProduct" not in plan, plan


def test_pipeline6_batch3_plan_shapes(spark, sf_dir):
    """Attribution is one user-keyed window (no self-join); conversion
    latency is two keyed aggs + a user join; the kNN eval broadcasts the
    probe side so the corpus is scanned once with no real cartesian."""
    from hadrodb_spark.operators import pipeline6 as P6

    at = P6.attribution_last_touch(spark, sf_dir)
    plan = E.formatted_plan(at)
    assert E.shuffle_count(at) <= 2, plan  # user window + touch agg
    assert "CartesianProduct" not in plan, plan

    fc = P6.funnel_time_to_convert(spark, sf_dir)
    plan = E.formatted_plan(fc)
    assert "CartesianProduct" not in plan, plan
    assert E.shuffle_count(fc) <= 5, plan

    kn = P6.knn_label_eval(spark, sf_dir)
    plan = E.formatted_plan(kn)
    assert E.has_broadcast_join(kn), plan
    assert "CartesianProduct" not in plan, plan


def test_sketch_mg_hll_plan_shapes(spark, sf_dir):
    """The Misra-Gries pass must keep the sketch partial map-side
    (mapInPandas before any exchange — summaries shuffle, not raw terms)
    and the HLL rollup must be two keyed aggregations with a broadcast
    1-row exact join."""
    from hadrodb_spark.operators import pipeline6 as P6

    fi = P6.sketch_frequent_items(spark, sf_dir)
    plan = E.formatted_plan(fi)
    assert "MapInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan

    hll = P6.sketch_hll_daily_union(spark, sf_dir)
    plan = E.formatted_plan(hll)
    assert E.shuffle_count(hll) <= 5, plan
    assert "CartesianProduct" not in plan, plan


def test_semdedup_entropy_plan_shapes(spark, sf_dir):
    """SemDeDup's pair scan must be a label-keyed equi-join (bounded by
    cluster size), never a cartesian; the entropy gate is two keyed
    aggregations over the char explosion."""
    from hadrodb_spark.operators import pipeline6 as P6

    sd = P6.semdedup_within_label(spark, sf_dir)
    plan = E.formatted_plan(sd)
    assert "CartesianProduct" not in plan, plan

    eg = P6.char_entropy_gate(spark, sf_dir)
    plan = E.formatted_plan(eg)
    assert E.shuffle_count(eg) <= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_ema_udtf_plan_shapes(spark, sf_dir):
    """The recursive EMA runs as ONE user-keyed FlatMapGroupsInPandas
    (single shuffle); the UDTF expands via a lateral generator, no
    cartesian."""
    from hadrodb_spark.operators import pipeline6 as P6

    em = P6.ema_per_user(spark, sf_dir)
    plan = E.formatted_plan(em)
    assert "FlatMapGroupsInPandas" in plan, plan
    assert E.shuffle_count(em) <= 1, plan

    ut = P6.udtf_chunk_expand(spark, sf_dir)
    plan = E.formatted_plan(ut)
    assert "CartesianProduct" not in plan, plan


def test_curation_funnel_v2_plan_shape(spark, sf_dir):
    """The composed funnel must stay at bounded keyed work: the only
    explicit broadcast is the 1-row threshold, no cartesian blowup from
    the three gate joins."""
    from hadrodb_spark.operators import pipeline6 as P6

    fv = P6.curation_funnel_v2(spark, sf_dir)
    plan = E.formatted_plan(fv)
    assert "CartesianProduct" not in plan, plan
    # inline(array(...)) keeps ONE agg lineage — exactly one threshold
    # hint, no per-stage re-computation
    assert E.explicit_broadcast_hint_count(fv) == 1, plan


def test_bitmap_distinct_plan_shape(spark, sf_dir):
    """The bitmap rollup must aggregate bitmaps, never raw rows twice at
    the merge grain: objecthashed bitmap aggs, no cartesian."""
    from hadrodb_spark.operators import pipeline6 as P6

    bd = P6.bitmap_daily_distinct(spark, sf_dir)
    plan = E.formatted_plan(bd)
    assert "CartesianProduct" not in plan, plan
    assert "bitmap" in plan.lower(), plan


def test_orc_scan_pushes_filter(spark, sf_dir):
    """The ORC reader must receive the event_type pushdown and prune to
    the 4 needed columns — format parity with the parquet scan contract."""
    from hadrodb_spark.operators import nativefmt as N

    df = N.orc_roundtrip_scan(spark, sf_dir)
    plan = E.formatted_plan(df)
    assert E.has_pushed_filters(df), plan
    cols = set(E.read_schema_columns(df))
    # user_id is written but pruned — the agg never touches it
    assert cols == {"event_id", "event_type", "cents"}, cols


def test_interval_overlap_is_equi_banded(spark, sf_dir):
    """The banded interval-overlap join must plan as an EQUI join on
    (supplier, bucket) — a hash join AQE can re-plan / skew-split — and
    never the quadratic BroadcastNestedLoop / CartesianProduct a naive
    non-equi interval self-join produces. The exactly-once bucket filter
    and the overlap predicate ride as post-join filters, not join-strategy
    downgrades."""
    from hadrodb_spark.operators.relational4 import join_interval_overlap

    df = join_interval_overlap(spark, sf_dir)
    df.count()  # execute so AQE finalizes strategies
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan
    assert "TakeOrderedAndProject" in plan, plan  # top-k never full-sorts


def test_fragment_stitch_is_equi_hash_join(spark, sf_dir):
    """The tail→head candidate join must plan as an equi hash/merge join
    on the fingerprint — never a nested-loop over the corpus (the
    all-pairs shape the fingerprint blocking exists to avoid)."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.pipeline7 import fragment_stitch

    try:
        df = fragment_stitch(spark, sf_dir)
        df.count()  # execute so AQE finalizes strategies
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
            "ShuffledHashJoin" in plan
        ), plan
    finally:
        shared.release_shared()


def test_group_uniform_sample_rank_prunes_early(spark, sf_dir):
    """The per-group rank filter must plan as WindowGroupLimit (rank
    computed and pruned per partition before any downstream work) — not a
    full-materialize-then-filter window."""
    from hadrodb_spark.operators.pipeline7 import group_uniform_sample

    df = group_uniform_sample(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_split_leakage_audit_is_pure_aggregation(spark, sf_dir):
    """The leakage audit must stay join-free with map-side partial
    aggregation ahead of its one fingerprint exchange — the shape that
    survives any corpus size."""
    from hadrodb_spark.operators.pipeline7 import split_leakage_audit

    df = split_leakage_audit(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    # plan strings print top-down: the fp exchange's child (the map-side
    # partial aggregate) appears AFTER it in the text
    fp_exchange = plan.index("Exchange hashpartitioning(fp")
    assert "partial_sum" in plan[fp_exchange:], plan


def test_embedding_dim_stats_combines_map_side(spark, sf_dir):
    """The per-dimension power sums must partially aggregate BEFORE the
    dim exchange — each task emits 64 partial rows, not its exploded
    input."""
    from hadrodb_spark.operators.pipeline7 import embedding_dim_stats

    df = embedding_dim_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # top-down print: the dim exchange's map-side partial child follows it
    dim_exchange = plan.index("Exchange hashpartitioning(dim")
    assert "partial_count" in plan[dim_exchange:], plan


def test_source_ks_shift_aggregates_before_grid(spark, sf_dir):
    """The KS evaluation grid must be built from POST-aggregation
    relations (per-source totals × distinct values), never from raw rows:
    the first partial aggregate has to appear before any join in the
    plan, keeping the nested-loop grid bounded by |sources|·|values|."""
    from hadrodb_spark.operators.pipeline7 import source_ks_shift

    from hadrodb_spark.operators import shared

    try:
        df = source_ks_shift(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # top-down print: a join's children (its inputs) follow it in the
        # text. The grid join's inputs must aggregate before any leaf scan
        # (FileScan, or the persisted counts' InMemoryTableScan) — proving
        # raw rows never enter the grid.
        first_join = min(
            plan.index(j)
            for j in ("BroadcastNestedLoopJoin", "CartesianProduct", "Join")
            if j in plan
        )
        below = plan[first_join:]
        first_scan = min(
            below.index(s)
            for s in ("FileScan", "InMemoryTableScan", "TableCacheQueryStage")
            if s in below
        )
        assert "HashAggregate" in below[:first_scan], plan
    finally:
        shared.release_shared()


def test_skyline_is_join_free_single_pass(spark, sf_dir):
    """The windowed skyline must stay the one-pass shape: no join of any
    kind (the naive dominance formulation is a quadratic self-join) —
    just window evaluation over one scan."""
    from hadrodb_spark.operators.pipeline7 import skyline_parts

    df = skyline_parts(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_autocorr_aggregates_before_window(spark, sf_dir):
    """The lag window must run over the per-(type, day) aggregate (a
    |types|x|days| relation), never raw events: the daily partial
    aggregate has to appear below the Window node in the plan."""
    from hadrodb_spark.operators.pipeline7 import autocorr_daily

    df = autocorr_daily(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    win = plan.index("Window")
    assert "partial_sum" in plan[win:], plan


def test_drift_psi_grid_from_aggregates(spark, sf_dir):
    """PSI's grid must be built from POST-aggregation relations (months x
    bins, both catalog-sized) with the raw orders scan feeding exactly one
    map-side-combined (month, bin) aggregate; reference-month counts and
    the bin grid join back by broadcast."""
    from hadrodb_spark.operators.pipeline8 import drift_psi_monthly

    df = drift_psi_monthly(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    first_join = plan.index("Join")
    assert "partial_count" in plan[first_join:], plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_k_anonymity_is_pure_aggregation(spark, sf_dir):
    """The k-anonymity audit is two stacked aggregates — no join may
    appear, and the equivalence-class exchange must carry map-side
    partial counts."""
    from hadrodb_spark.operators.pipeline8 import k_anonymity_audit

    df = k_anonymity_audit(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    cls_exchange = plan.index("Exchange hashpartitioning(c_mktsegment")
    assert "partial_count" in plan[cls_exchange:], plan


def test_temporal_split_single_user_shuffle(spark, sf_dir):
    """The embargo split's only row-scale exchange is the user_id
    aggregate (map-side combined); the cutoff is a broadcast 1-row
    relation, never a join key on the big side."""
    from hadrodb_spark.operators.pipeline8 import temporal_split_embargo

    df = temporal_split_embargo(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    user_exchange = plan.index("Exchange hashpartitioning(user_id")
    assert "partial_count" in plan[user_exchange:], plan
    assert "SortMergeJoin" not in plan, plan


def test_ivfpq_broadcasts_index_structures(spark, sf_dir):
    """The composite ANN's query path must broadcast every index
    structure (probe set, ADC table, codebooks) and rank via TakeOrdered
    — the big side is scanned, never shuffled for a sort."""
    from hadrodb_spark.operators.similarity import vector_topk_ivfpq

    df = vector_topk_ivfpq(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_phash_neardup_is_equi_banded(spark, sf_dir):
    """The perceptual near-dup self-join must be an equi-join on the band
    key — a nested-loop or cartesian pairing is the all-pairs shape the
    banding exists to avoid."""
    from hadrodb_spark.operators.multimodal_ops import multimodal_phash_neardup

    df = multimodal_phash_neardup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_winsorized_thresholds_broadcast(spark, sf_dir):
    """The winsorize clamp must join the tiny per-priority threshold
    relation by broadcast — a sort-merge join would shuffle the full
    orders scan on a |priorities|-cardinality key."""
    from hadrodb_spark.operators.pipeline9 import winsorized_stats

    df = winsorized_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_source_concentration_windows_post_aggregation(spark, sf_dir):
    """The Gini rank window must run AFTER the groupBy(source) reduce:
    the corpus scan feeds exactly one map-side-combined aggregate, and
    every Window/Sort in the plan sits downstream of it."""
    from hadrodb_spark.operators.pipeline9 import source_concentration

    df = source_concentration(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    agg = plan.index("partial_count")
    # the only window sort is over the aggregated |sources|-row relation:
    # it must appear BEFORE (downstream of, in toString order) the scan's
    # partial aggregate, and there must be no join at all
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert "Window" in plan[: agg + 2000], plan


def test_upsample_expansion_is_map_side(spark, sf_dir):
    """The epoch expansion must be generate-after-broadcast-join: the
    corpus scan joins the |sources|-row factor relation by broadcast and
    explodes map-side — no shuffle may carry expanded rows (the final
    aggregate's exchange carries map-side-combined partials only)."""
    from hadrodb_spark.operators.pipeline9 import upsample_epochs

    df = upsample_epochs(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    gen = plan.index("Generate explode")
    assert "partial_count" in plan[:gen], plan


def test_ranker_overlap_ranks_via_takeordered(spark, sf_dir):
    """Both top-20 rankings must be TakeOrdered-style limits over the ONE
    persisted vocab relation (without the persist, Catalyst plans each
    ranking as its own corpus scan+tokenization); the only
    row-scale-capable join is the full-outer merge of the two ≤20-row
    ranked lists."""
    from hadrodb_spark.operators.pipeline10 import ranker_overlap_topk

    df = ranker_overlap_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # both rankings read the shared cache, not their own corpus scan
    assert plan.count("InMemoryTableScan") >= 2, plan
    # any SortMergeJoin must sit ABOVE (consume) the TakeOrdered limits —
    # i.e. it merges the two 20-row lists, not corpus-scale relations
    if "SortMergeJoin" in plan:
        assert plan.index("SortMergeJoin") < plan.index(
            "TakeOrderedAndProject"
        ), plan


def test_shard_balance_is_pure_aggregation(spark, sf_dir):
    """The shard audit is two stacked aggregates — no join may appear,
    and the 64-key exchange must carry map-side partial counts."""
    from hadrodb_spark.operators.pipeline10 import shard_balance

    df = shard_balance(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    ex = plan.index("Exchange hashpartitioning(shard")
    assert "partial_count" in plan[ex:], plan


def test_seasonal_decompose_windows_post_aggregation(spark, sf_dir):
    """The decomposition's windows (centered MA, seasonal mean) must run
    over the per-day aggregate, never raw events: the raw scan feeds
    exactly one map-side-combined (day) aggregate, and the seasonal
    relation joins back by broadcast."""
    from hadrodb_spark.operators.pipeline10 import seasonal_decompose_daily

    df = seasonal_decompose_daily(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    day_exchange = plan.index("Exchange hashpartitioning(day")
    assert "partial_sum" in plan[day_exchange:], plan


def test_score_calibration_windows_over_histogram(spark, sf_dir):
    """The calibration deciles must derive from the score HISTOGRAM: the
    raw scan feeds one map-side-combined (score) aggregate and every
    window sits downstream of it; no joins."""
    from hadrodb_spark.operators.pipeline10 import score_calibration_bins

    df = score_calibration_bins(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    ex = plan.index("Exchange hashpartitioning(score")
    assert "partial_count" in plan[ex:], plan


def test_poisson_bootstrap_expansion_is_map_side(spark, sf_dir):
    """The 32x replicate expansion must be a map-side Generate feeding a
    map-side-combined groupBy(b) — no shuffle may carry expanded rows,
    and the only join is the broadcast of the two 1-row reports."""
    from hadrodb_spark.operators.pipeline10 import poisson_bootstrap_ci

    df = poisson_bootstrap_ci(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    gen = plan.index("Generate explode")
    assert "partial_sum" in plan[:gen], plan


def test_fk_audit_joins_keys_only(spark, sf_dir):
    """Every FK edge must scan ONLY its key columns (pushed-down
    projection on both sides) — an audit that drags full rows through
    five joins is not runnable at 100 TB."""
    import re

    from hadrodb_spark.operators.pipeline11 import fk_integrity_audit

    df = fk_integrity_audit(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        assert schema.count(",") == 0, schema  # single column per scan


def test_cohort_ltv_windows_post_aggregation(spark, sf_dir):
    """The LTV cumulative window must run over the (cohort, age)
    aggregate — the raw orders scan feeds the custkey first-order
    aggregate and the tag join, nothing else; the cohort-size relation
    joins by broadcast."""
    from hadrodb_spark.operators.pipeline11 import cohort_ltv_curve

    df = cohort_ltv_curve(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    win = plan.index("Window")
    assert "partial_sum" in plan[win:], plan


def test_dau_wau_mau_expands_bitmaps_not_rows(spark, sf_dir):
    """The 28x expansion must run on the (day, bucket) bitmap aggregate —
    the Generate sits downstream of the partial bitmap aggregate, and no
    range join (nested loop) appears anywhere."""
    from hadrodb_spark.operators.pipeline11 import dau_wau_mau

    df = dau_wau_mau(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    gen = plan.index("Generate explode")
    assert "partial_bitmap_construct_agg" in plan[gen:], plan


def test_user_entropy_single_user_type_aggregate(spark, sf_dir):
    """The entropy report's raw scan feeds ONE map-side-combined
    (user, type) aggregate; every window and re-aggregate sits
    downstream of it; no joins."""
    from hadrodb_spark.operators.pipeline11 import user_entropy_histogram

    df = user_entropy_histogram(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    ex = plan.index("Exchange hashpartitioning(user_id")
    assert "partial_count" in plan[ex:], plan


def test_vocab_overlap_reuses_persisted_ts(spark, sf_dir):
    """All three consumers of the (term, source) relation (sizes + both
    self-join sides) must read the ONE persisted cache, not re-run the
    corpus tokenize pass."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.pipeline11 import source_vocab_overlap

    try:
        df = source_vocab_overlap(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # each consumer is an InMemoryTableScan; the FileScans visible in
        # toString are the cached relation's BUILD plan rendered inside
        # each cache node, not separate executions
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
        shared.release_shared()


def test_pareto_windows_over_digit_buckets(spark, sf_dir):
    """The Lorenz windows must run over the <= 12-row digit-bucket
    relation: raw orders feed one custkey aggregate, buckets collapse
    it, and only then do unpartitioned windows appear; no joins."""
    from hadrodb_spark.operators.pipeline12 import revenue_pareto_curve

    df = revenue_pareto_curve(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    ex = plan.index("Exchange hashpartitioning(o_custkey")
    assert "partial_sum" in plan[ex:], plan


def test_anova_single_type_aggregate(spark, sf_dir):
    """ANOVA reduces the corpus in ONE map-side-combined groupBy(type);
    no joins, no windows over raw rows."""
    from hadrodb_spark.operators.pipeline12 import anova_value_by_type

    df = anova_value_by_type(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    ex = plan.index("Exchange hashpartitioning(event_type")
    assert "partial_count" in plan[ex:], plan


def test_ship_lag_joins_keys_and_dates_only(spark, sf_dir):
    """The fact-to-fact lag join must move only key + date columns
    (projection pushed to both scans) and aggregate immediately."""
    import re

    from hadrodb_spark.operators.pipeline12 import ship_lag_percentiles

    df = ship_lag_percentiles(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        assert schema.count(",") <= 2, schema  # <= 3 columns per scan
    assert "CartesianProduct" not in plan, plan


def test_dsir_no_cartesian_and_broadcast_scoring(spark, sf_dir):
    """DSIR's scoring join must broadcast the 64-row log-ratio relation
    against the (doc, bucket) counts — never shuffle or cartesian the
    count side against it — and the only crossJoins allowed are the
    1-row totals broadcasts."""
    from hadrodb_spark.operators.pipeline13 import dsir_importance

    df = dsir_importance(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the doc-level counts aggregate exists and is partial (map-side
    # combined) before its exchange
    ex = plan.index("Exchange hashpartitioning(doc_id")
    assert "partial_count" in plan[ex:] or "partial_sum" in plan[ex:], plan


def test_bigram_xent_single_gram_aggregate(spark, sf_dir):
    """bigram_xent must build ONE (doc, bigram) counts relation and derive
    corpus totals from it by window sums — a second aggregate of the gram
    relation (the vocab-join shape unigram_logprob's review killed) would
    re-explode the corpus."""
    from hadrodb_spark.operators.pipeline13 import bigram_xent

    df = bigram_xent(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    # exactly one exchange keyed by the bigram text (the window re-sorts
    # reuse it); a second would mean the gram relation aggregated twice
    assert plan.count("Exchange hashpartitioning(bg") <= 1, plan


def test_vector_topk_filtered_pushes_label_predicate(spark, sf_dir):
    """The filtered-ANN contract: the label predicate must reach the
    parquet scan (pre-filtering), not run post-scan — at 100 TB this is
    the difference between decoding s*N and N vector rows."""
    from hadrodb_spark.operators.similarity import vector_topk_filtered

    df = vector_topk_filtered(spark, sf_dir)
    plan = E.formatted_plan(df)
    import re

    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    assert any(
        re.search(r"In\(label, \[1,\s*3\]\)", ln) for ln in pushed
    ), "\n".join(pushed) or plan


def test_phi_and_ess_are_join_free_single_aggregate(spark, sf_dir):
    """gate_phi_matrix reduces to one 8-bin histogram aggregate and
    mixture_ess to one keyed moment aggregate — any Join in either plan
    means the bounded-relation design regressed to a row-scale join."""
    from hadrodb_spark.operators.pipeline15 import gate_phi_matrix, mixture_ess

    for fn in (gate_phi_matrix, mixture_ess):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, plan


def test_kruskal_grid_aggregates_before_rank_join(spark, sf_dir):
    """The KW rank join must consume the (event_type, cents) AGGREGATE,
    never raw events: below the first join, an aggregate (or the
    persisted counts cache) must appear before any file scan."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.pipeline15 import kruskal_wallis_value

    try:
        plan = (
            kruskal_wallis_value(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        first_join = plan.index("Join")
        below = plan[first_join:]
        first_file_scan = below.index("FileScan") if "FileScan" in below else len(below)
        cached_or_agg = min(
            [
                below.index(s)
                for s in (
                    "HashAggregate",
                    "InMemoryTableScan",
                    "TableCacheQueryStage",
                )
                if s in below
            ]
        )
        assert cached_or_agg < first_file_scan, plan
    finally:
        shared.release_shared()


def test_conformal_single_counts_relation(spark, sf_dir):
    """conformal_coverage_audit derives calib quantile, test totals, AND
    coverage from ONE persisted (type, parity, cents) count grid — the
    plan must reuse the cache (≥2 InMemoryTableScan/TableCacheQueryStage
    consumers), not rescan events per consumer."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.pipeline15 import conformal_coverage_audit

    try:
        df = conformal_coverage_audit(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        cache_hits = plan.count("InMemoryTableScan") + plan.count(
            "TableCacheQueryStage"
        )
        # NOTE: the printed plan repeats the cached relation's FileScan
        # under every InMemoryTableScan consumer, so counting FileScan
        # text is meaningless — the cache-consumer count is the pin (at
        # runtime only the InMemoryRelation is scanned per consumer).
        assert cache_hits >= 2, plan
    finally:
        shared.release_shared()


def test_filtered_topk_no_shuffle_before_topk(spark, sf_dir):
    """vector_topk_filtered is scan → broadcast query join → TakeOrdered:
    zero shuffles on the corpus side (the broadcast is the only
    exchange class allowed)."""
    from hadrodb_spark.operators.similarity import vector_topk_filtered

    df = vector_topk_filtered(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    import re

    non_broadcast_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert not non_broadcast_exchanges, plan


# ------------------------------------------------- round-9 session-3 additions
def test_p16_matrix_and_moment_queries_are_join_free(spark, sf_dir):
    """bowker_symmetry / markov_entropy_rate fold the |types|² transition
    matrix with aggregates only; runs_test_updown runs windows over the
    calendar-day relation; welch_t_value is one conditional moment
    aggregate.  Any Join in these plans means a bounded-relation design
    regressed to a row-scale join."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.pipeline16 import (
        bowker_symmetry,
        markov_entropy_rate,
        runs_test_updown,
        welch_t_value,
    )

    try:
        for fn in (
            bowker_symmetry,
            markov_entropy_rate,
            runs_test_updown,
            welch_t_value,
        ):
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "Join" not in plan, (fn.__name__, plan)
    finally:
        shared.release_shared()


def test_mann_kendall_pairs_broadcast_the_daily_aggregate(spark, sf_dir):
    """The MK day-pair grid must be a BROADCAST nested-loop join over the
    persisted calendar-day aggregate — below the first join an aggregate
    or cache must appear before any FileScan (raw orders never enter the
    pair grid), and the non-equi join must be broadcast, not a shuffled
    cartesian."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.pipeline16 import mann_kendall_trend

    try:
        plan = (
            mann_kendall_trend(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        below = plan[plan.index("Join"):]
        first_scan = (
            below.index("FileScan") if "FileScan" in below else len(below)
        )
        cached_or_agg = min(
            below.index(s)
            for s in (
                "HashAggregate",
                "InMemoryTableScan",
                "TableCacheQueryStage",
            )
            if s in below
        )
        assert cached_or_agg < first_scan, plan
    finally:
        shared.release_shared()


def test_cramers_and_quantile_profile_reuse_their_count_grids(spark, sf_dir):
    """cramers_v_priority_status derives marginals + grid from ONE
    persisted (priority, status) count relation, and
    quantile_profile_sources derives totals + cumulative ranks from ONE
    persisted (source, len) count relation — the plan must show ≥2 cache
    consumers, not a rescan per consumer."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.pipeline16 import (
        cramers_v_priority_status,
        quantile_profile_sources,
    )

    try:
        for fn in (cramers_v_priority_status, quantile_profile_sources):
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            cache_hits = plan.count("InMemoryTableScan") + plan.count(
                "TableCacheQueryStage"
            )
            assert cache_hits >= 2, (fn.__name__, plan)
    finally:
        shared.release_shared()


def test_token_budget_pack_single_window_shuffle(spark, sf_dir):
    """token_budget_pack is scan → per-source window sort → aggregate:
    the groupBy must REUSE the window's hash partitioning on source (no
    second wide shuffle), the plan is join-free, and only the final
    20-row ORDER BY may add its range exchange."""
    from hadrodb_spark.operators.pipeline16 import token_budget_pack

    plan = (
        token_budget_pack(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("hashpartitioning") <= 1, plan


def test_graph_additions_no_cartesian_and_topk(spark, sf_dir):
    """graph_clustering_coefficient's 1-row summary cross-joins must stay
    broadcast (no CartesianProduct anywhere), and graph_adamic_adar_topk
    must end in TakeOrdered (top-k never collects the scored relation)."""
    from hadrodb_spark.operators.graph import (
        graph_adamic_adar_topk,
        graph_clustering_coefficient,
    )

    cc = (
        graph_clustering_coefficient(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in cc, cc
    aa = (
        graph_adamic_adar_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in aa, aa
    assert "TakeOrdered" in aa, aa
