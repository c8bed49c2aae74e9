"""Streaming join semantics vs batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import load
from hadrodb_spark.streaming import events as S
from hadrodb_spark.streaming.joins import enrich_stream, purchases_after_signup


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sj") / "events")
    load(spark, sf_dir, "events").repartition(4).write.parquet(d)
    return d


def test_stream_static_enrichment(spark, sf_dir, event_dir):
    dim = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("lifetime_events"))
    )
    out = enrich_stream(S.stream_events(spark, event_dir), dim, "user_id")
    S.run_to_memory(out, "t_enrich", "append")
    got = spark.table("t_enrich")
    n_events = load(spark, sf_dir, "events").count()
    assert got.count() == n_events
    assert got.filter(F.col("lifetime_events").isNull()).count() == 0


def test_stream_stream_join_matches_batch(spark, sf_dir, event_dir):
    sig = S.stream_events(spark, event_dir).filter(F.col("event_type") == "signup")
    pur = S.stream_events(spark, event_dir).filter(F.col("event_type") == "purchase")
    out = purchases_after_signup(sig, pur, "2 hours")
    S.run_to_memory(out, "t_ss_join", "append")
    got = spark.table("t_ss_join")

    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    batch = s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 2 hours")),
    )
    # availableNow drains everything: stream join must equal the batch join
    assert got.count() == batch.count()
    assert got.count() > 0


def test_stream_stream_left_outer(spark, sf_dir, event_dir):
    from hadrodb_spark.streaming.joins import left_outer_purchases

    sig = S.stream_events(spark, event_dir).filter(F.col("event_type") == "signup")
    pur = S.stream_events(spark, event_dir).filter(F.col("event_type") == "purchase")
    out = left_outer_purchases(sig, pur, "2 hours")
    S.run_to_memory(out, "t_ss_left", "append")
    got = spark.table("t_ss_left")
    matched = got.filter(F.col("purchase_id").isNotNull()).count()
    unmatched = got.filter(F.col("purchase_id").isNull()).count()
    assert matched > 0
    # null-extended rows exist for signups with no purchase in the window
    # (availableNow closes the watermark at end of input, so they emit)
    assert unmatched > 0
    # every signup older than the final watermark horizon MUST have emitted
    # (matched or null-extended); ones in the last <within> of the stream may
    # legitimately be withheld — the watermark can't prove them unmatched yet
    n_signups = spark.table("t_ss_left").select("signup_id").distinct().count()
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    # emission needs the combined state watermark (input delay 2h + join
    # window 2h + eviction margin) to pass the signup — use a conservative
    # 8h provable horizon; anything older MUST have emitted
    provable = ev.filter(
        (F.col("event_type") == "signup")
        & (F.col("ts") <= F.lit(max_ts) - F.expr("INTERVAL 8 hours"))
    ).count()
    batch_signups = ev.filter(F.col("event_type") == "signup").count()
    assert provable <= n_signups <= batch_signups
