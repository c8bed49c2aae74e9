"""Bucketed co-located join (shuffle-free) and salted-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import load
from hadrodb_spark.operators.skew import salted_join
from hadrodb_spark.plans import explain as E
from hadrodb_spark.sources.bucketed import bucketed_join, write_bucketed

import pytest

# Slow tier: session-scoped bucketed-table build (~12 s setup).
pytestmark = pytest.mark.slow


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "t_li_b", "l_orderkey", buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "t_o_b", "l_orderkey", 8
    )
    joined = bucketed_join(spark, "t_li_b", "t_o_b", "l_orderkey")
    # co-located buckets: the join itself needs NO Exchange
    assert E.shuffle_count(joined) == 0, E.formatted_plan(joined)
    # and it is still correct
    plain = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    assert joined.count() == plain.count()


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    salted = salted_join(li, orders, "l_orderkey", salt=8)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    s = {tuple(r) for r in salted.collect()}
    p = {tuple(r) for r in plain.collect()}
    assert s == p


def test_lww_skew_safe_merge_equivalence_and_plan(spark, tmp_path):
    """Round-9 VERDICT task #6: the LWW merge under a deliberately
    90%-one-key log.  A window partition cannot be split (AQE skew
    handling covers joins/rebalances, not window exchanges), so the
    skew-safe path must (a) produce the EXACT same LWW view and (b) show
    partial ``max_by`` aggregation in the plan — every hot key collapses
    to one row per map task BEFORE the shuffle, which is the structural
    skew defense."""
    from pyspark.sql import types as T

    from hadrodb_spark.sources.collection import HadroCollection

    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), True),
            T.StructField("v", T.LongType(), True),
        ]
    )
    coll = HadroCollection(spark, str(tmp_path / "skewed"), schema)
    # commit 1: 9000 versions of ONE hot key + 1000 distinct cold keys
    hot = spark.range(9000).selectExpr("'hot' AS k", "id AS v")
    cold = spark.range(1000).selectExpr(
        "CONCAT('cold_', id) AS k", "id AS v"
    )
    coll.append_df(hot.unionAll(cold).repartition(8), key_col="k")
    # commit 2: one more version of the hot key — the LWW winner
    coll.append_df(
        spark.createDataFrame([("hot", -1)], schema), key_col="k"
    )

    log = coll._log()
    window_view = coll._latest(log)
    agg_view = coll._latest(log, skew_safe=True)

    w = {tuple(r) for r in window_view.select("k", "v").collect()}
    a = {tuple(r) for r in agg_view.select("k", "v").collect()}
    assert a == w
    assert ("hot", -1) in a and len(a) == 1001
    assert window_view.columns == agg_view.columns

    # plan pin: partial max_by BEFORE the exchange = map-side skew collapse
    plan = agg_view._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan, plan

    # the session conf routes scan() through the skew-safe path
    spark.conf.set("spark.hadrodb.skewSafeMerge", "true")
    try:
        scan_plan = (
            coll.scan()._jdf.queryExecution().executedPlan().toString()
        )
        assert "partial_max_by" in scan_plan, scan_plan
        assert {tuple(r) for r in coll.scan().select("k", "v").collect()} == a
    finally:
        spark.conf.unset("spark.hadrodb.skewSafeMerge")
    # default stays the window path (predicate-pushdown-friendly)
    default_plan = coll.scan()._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" not in default_plan
