"""Bucketed co-located join (shuffle-free) and salted-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import load
from hadrodb_spark.operators.skew import salted_join
from hadrodb_spark.plans import explain as E
from hadrodb_spark.sources.bucketed import bucketed_join, write_bucketed


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
