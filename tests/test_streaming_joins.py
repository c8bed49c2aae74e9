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


def _write_ooo_batches(spark, d, chunks):
    """Write each chunk as one parquet file with PINNED mtimes so the file
    source forms micro-batches in exactly this (adversarial) order."""
    import os

    from hadrodb_spark.streaming.events import EVENT_SCHEMA

    seen: set[str] = set()
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        new = {f for f in os.listdir(d) if f.endswith(".parquet")} - seen
        seen |= new
        for f in new:
            os.utime(os.path.join(d, f), (1_700_000_000 + i * 100,) * 2)


@pytest.mark.slow
def test_left_outer_exact_under_out_of_order_arrival(spark, tmp_path):
    """Adversarial fixture for the stream-stream LEFT OUTER join: purchases
    arrive in a micro-batch BEFORE their signups (event-time order inverted
    across batches).  Exact expected output:

    - u1: purchase 1h after signup, inside the 2h window → matched, even
      though the purchase was buffered before its signup existed;
    - u2: purchase 4h after signup → outside the window: signup emits
      null-extended, the orphan purchase emits nothing;
    - u3: no purchase at all → null-extended;
    - sentinel signup/purchase (u999, +24h/+30h) advance BOTH side
      watermarks so the outer state provably finalizes; the sentinel signup
      itself stays within the final watermark horizon and must NOT emit.
    """
    from datetime import datetime, timedelta

    from hadrodb_spark.streaming.events import EVENT_SCHEMA
    from hadrodb_spark.streaming.joins import left_outer_purchases

    base = datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, hours, uid, etype):
        return (eid, base + timedelta(hours=hours), uid, etype, 1.0, "{}")

    chunks = [
        # batch 1: purchases FIRST (their signups don't exist yet)
        [ev(201, 1, 1, "purchase"), ev(202, 4, 2, "purchase")],
        # batch 2: the signups
        [ev(101, 0, 1, "signup"), ev(102, 0, 2, "signup"), ev(103, 0, 3, "signup")],
        # batches 3-4: sentinels push s/p watermarks past the outer horizon
        [ev(901, 24, 999, "signup")],
        [ev(902, 30, 999, "purchase")],
    ]
    d = str(tmp_path / "ooo_join")
    _write_ooo_batches(spark, d, chunks)

    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    sig = stream.filter(F.col("event_type") == "signup")
    pur = stream.filter(F.col("event_type") == "purchase")
    out = left_outer_purchases(sig, pur, "2 hours")
    S.run_to_memory(out, "t_ooo_left", "append")
    got = {
        (r["signup_id"], r["purchase_id"])
        for r in spark.table("t_ooo_left").collect()
    }
    assert got == {(101, 201), (102, None), (103, None)}


def test_running_totals_exact_under_out_of_order_arrival(spark, tmp_path):
    """Adversarial fixture for the applyInPandasWithState accumulator: one
    user's events split across batches in inverted event-time order, a
    second user interleaved.  Update-mode emissions must be the exact
    per-batch prefix sums of ARRIVAL order (the operator's contract — state
    folds arrival order, values here are 2-decimal exact), and the final
    row must equal the exact batch aggregate regardless of order."""
    from datetime import datetime, timedelta

    from hadrodb_spark.streaming.ingest import running_user_totals

    base = datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, minutes, uid, val):
        return (eid, base + timedelta(minutes=minutes), uid, "t", val, "{}")

    chunks = [
        # u1's LATE events arrive first; u2 interleaved across batches
        [ev(3, 30, 1, 3.25), ev(4, 40, 1, 4.25), ev(13, 30, 2, 10.0)],
        [ev(1, 10, 1, 1.25), ev(14, 40, 2, 20.5)],
        [ev(2, 20, 1, 2.25)],
    ]
    d = str(tmp_path / "ooo_totals")
    _write_ooo_batches(spark, d, chunks)

    from hadrodb_spark.streaming.events import EVENT_SCHEMA

    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    S.run_to_memory(running_user_totals(stream), "t_ooo_totals", "update")
    rows = spark.table("t_ooo_totals").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["n_events"], r["total_value"])
        )
    # emissions are cumulative per batch in arrival order (sorted by
    # n_events to be robust to update-mode emission interleave)
    assert sorted(per_user[1]) == [(2, 7.5), (3, 8.75), (4, 11.0)]
    assert sorted(per_user[2]) == [(1, 10.0), (2, 30.5)]


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


def test_session_merge_exact_under_out_of_order_arrival(spark, tmp_path):
    """Adversarial session-window fixture: the BRIDGING event arrives last.
    User 1 has events at 12:00, 12:40, and 12:20 (arrival order 12:40,
    12:00, then 12:20) with a 30-minute gap — the first two batches create
    TWO provisional sessions ([12:00) and [12:40)), and the late 12:20
    event must MERGE them into one [12:00, 13:10) session of 3 events.
    User 2's two bursts stay separate sessions. Exact expected rows."""
    from datetime import datetime, timedelta

    from hadrodb_spark.streaming.events import EVENT_SCHEMA, session_windows

    base = datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, minutes, uid):
        return (eid, base + timedelta(minutes=minutes), uid, "t", 1.0, "{}")

    chunks = [
        [ev(3, 40, 1), ev(11, 0, 2)],       # provisional session B + u2 burst 1
        [ev(1, 0, 1)],                      # provisional session A
        [ev(2, 20, 1), ev(12, 300, 2)],     # the bridge (late) + u2 burst 2
        [ev(901, 600, 999)],                # sentinels advance the watermark
        [ev(902, 660, 999)],
    ]
    d = str(tmp_path / "ooo_sessions")
    _write_ooo_batches(spark, d, chunks)

    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    S.run_to_memory(session_windows(stream), "t_ooo_sess", "append")
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("t_ooo_sess").collect()
        if r["user_id"] != 999
    }
    m = lambda mins: base + timedelta(minutes=mins)
    assert got == {
        (1, m(0), m(70), 3),      # merged: 12:00 + 12:20 + 12:40, end 12:40+30m
        (2, m(0), m(30), 1),
        (2, m(300), m(330), 1),
    }
