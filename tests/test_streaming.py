"""Streaming semantics tests with deterministic fixtures: results of each
streaming operator (run with availableNow over a static directory) must equal
the equivalent batch computation — the no-oracle strategy from SURVEY.md §7
risk 5."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import load
from hadrodb_spark.streaming import events as S


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    """Events table rewritten as a multi-segment streaming collection."""
    d = str(tmp_path_factory.mktemp("stream") / "events")
    load(spark, sf_dir, "events").repartition(4).write.parquet(d)
    return d


def _drain(spark, stream, name, mode="append"):
    S.run_to_memory(stream, name, mode)
    return spark.table(name)


def test_tumbling_counts_match_batch(spark, sf_dir, event_dir):
    out = _drain(
        spark, S.tumbling_counts(S.stream_events(spark, event_dir)), "t_tumble", "append"
    ).orderBy("window_start", "event_type")
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
        .orderBy("window_start", "event_type")
    )
    got = [tuple(r) for r in out.collect()]
    want = [tuple(r) for r in batch.collect()]
    # availableNow emits only windows closed by the final watermark; all
    # emitted windows must match their batch twins exactly
    assert len(got) > 0
    assert set(got) <= set(want)
    assert len(got) >= len(want) - 4  # at most the tail windows unemitted


def test_sliding_windows_overlap(spark, event_dir):
    out = _drain(
        spark,
        S.sliding_avg(S.stream_events(spark, event_dir)),
        "t_slide",
        "append",
    )
    rows = out.collect()
    assert len(rows) > 0
    # every event lands in 2 overlapping (2h, 1h-slide) windows: total
    # sliding n_events ≈ 2 × event count among emitted windows
    one_user = [r for r in rows if r["user_id"] == rows[0]["user_id"]]
    assert sum(r["n_events"] for r in one_user) > max(r["n_events"] for r in one_user)


def test_session_windows(spark, event_dir):
    out = _drain(
        spark,
        S.session_windows(S.stream_events(spark, event_dir)),
        "t_sess",
        "append",
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_stream_dedup_drops_duplicate_ids(spark, event_dir, tmp_path):
    # duplicate the whole input: every event_id appears twice across files
    dup_dir = str(tmp_path / "dup_events")
    spark.read.parquet(event_dir).write.parquet(dup_dir)
    spark.read.parquet(event_dir).write.mode("append").parquet(dup_dir)
    n_unique = spark.read.parquet(event_dir).count()
    out = _drain(
        spark, S.stream_dedup(S.stream_events(spark, dup_dir)), "t_dedup", "append"
    )
    assert out.count() == n_unique


def test_stream_source_is_incremental(spark, event_dir):
    # maxFilesPerTrigger=8 over a 4-file dir → at least one batch, bounded
    stream = S.stream_events(spark, event_dir)
    assert stream.isStreaming


def test_streaming_curation_matches_batch(spark, sf_dir, tmp_path):
    """The streaming funnel (gates in-flight + per-batch dedup + anti-join
    vs already-curated fingerprints) must land EXACTLY the batch
    curation_pipeline's output: same doc_ids, same quality/n_tokens.
    Originals stream before planted copies (one file each), so
    first-batch-wins == keep-lowest-doc_id."""
    from pyspark.sql import functions as F

    from hadrodb_spark.operators import dedup, pipeline2
    from hadrodb_spark.sources.collection import HadroCollection
    from hadrodb_spark.streaming import curation as SC

    src = str(tmp_path / "docs_src")
    corpus = dedup._with_exact_copies(spark, sf_dir)
    corpus.filter(F.col("doc_id") < 200000).coalesce(1).write.parquet(src)
    corpus.filter(F.col("doc_id") >= 200000).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    coll = HadroCollection(spark, str(tmp_path / "curated"), SC.CURATED_SCHEMA)
    q = SC.curate_stream(spark, src, coll, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["quality"], r["n_tokens"])
        for r in coll.scan(columns=["doc_id", "quality", "n_tokens"]).collect()
    }
    want = {
        r["doc_id"]: (r["quality"], r["n_tokens"])
        for r in pipeline2.curation_pipeline(spark, sf_dir).collect()
    }
    assert got == want
    # replaying the stream (same checkpoint, no new files) adds nothing
    q2 = SC.curate_stream(spark, src, coll, str(tmp_path / "ckpt"))
    q2.awaitTermination(60)
    assert len(coll) == len(want)


@pytest.mark.slow
def test_ordered_anomaly_exact_across_out_of_order_batches(spark, tmp_path):
    """flag_anomalies_ordered must flag the chronological-truth anomaly even
    when micro-batches arrive OUT of event-time order.

    Fixture: one user's events 0..39 (minute i, value ~10.5±1) with event 39
    a clear outlier (value 1000, 39 chronological priors). The LATER half
    (events 20..39) arrives in batch 1, the EARLIER half in batch 2 — a
    naive arrival-order fold would see event 39 with only 19 priors
    (< _ANOM_MIN_N = 20) and never flag it. Two far-future sentinel batches
    advance the watermark so the buffered events finalize via the
    event-time timeout."""
    import os
    from datetime import datetime, timedelta

    from hadrodb_spark.streaming.anomaly import flag_anomalies_ordered
    from hadrodb_spark.streaming.events import EVENT_SCHEMA

    base = datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, minutes, uid=1, val=None):
        v = 10.0 + (eid % 5) * 0.5 if val is None else val
        return (eid, base + timedelta(minutes=minutes), uid, "t", v, "{}")

    chunks = [
        [ev(i, i) for i in range(20, 39)] + [ev(39, 39, val=1000.0)],  # late half first
        [ev(i, i) for i in range(20)],                                 # early half second
        [ev(900, 600, uid=999)],                                       # sentinels: advance
        [ev(901, 660, uid=999)],                                       # watermark + timeout
    ]
    d = str(tmp_path / "ooo_events")
    seen: set[str] = set()
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        new = {f for f in os.listdir(d) if f.endswith(".parquet")} - seen
        seen |= new
        for f in new:  # pin mtime so the file source batches in THIS order
            os.utime(os.path.join(d, f), (1_700_000_000 + i * 100,) * 2)

    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    out = _drain(
        spark, flag_anomalies_ordered(stream, delay="40 minutes"), "t_anom_ord"
    )
    got = {(r["user_id"], r["event_id"]) for r in out.collect()}
    assert got == {(1, 39)}


def test_streaming_anomaly_matches_batch(spark, sf_dir, event_dir):
    """The stateful z-score detector must flag exactly the events the batch
    expanding-window query (the oracle-backed twin) flags."""
    from hadrodb_spark.operators.pipeline3 import anomaly_zscore
    from hadrodb_spark.streaming.anomaly import flag_anomalies

    out = _drain(
        spark, flag_anomalies(S.stream_events(spark, event_dir)), "t_anom", "append"
    )
    got = {(r["user_id"], r["event_id"]) for r in out.collect()}
    want = {
        (r["user_id"], r["event_id"]) for r in anomaly_zscore(spark, sf_dir).collect()
    }
    assert len(want) > 0, "fixture should contain anomalies"
    assert got == want


def test_trending_topk_matches_batch(spark, sf_dir, event_dir, tmp_path):
    """Rank-on-emit trending top-k: every emitted window's top-3 must equal
    the batch rank over the full data for that window."""
    out_dir = str(tmp_path / "trend_out")
    ckpt = str(tmp_path / "trend_ckpt")
    q = S.trending_topk_sink(
        S.tumbling_counts(S.stream_events(spark, event_dir)), out_dir, ckpt
    )
    q.awaitTermination()
    got = S.read_trending(spark, out_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in batch.collect()}
    assert len(got_rows) > 0
    # emitted windows (closed by final watermark) must match batch exactly
    assert got_rows <= want_rows
    emitted_windows = {r[0] for r in got_rows}
    missing = {r for r in want_rows if r[0] in emitted_windows} - got_rows
    assert not missing, missing


def test_countmin_stream_matches_batch(spark, sf_dir, event_dir, tmp_path):
    """Incrementally-maintained CMS counters (stream → collection upserts)
    must equal the one-shot batch counter build over the same events."""
    from hadrodb_spark.sources.collection import HadroCollection
    from hadrodb_spark.streaming import sketch as SK

    coll = HadroCollection(spark, str(tmp_path / "cms"), SK.CMS_SCHEMA)
    stream = S.stream_events(spark, event_dir)
    q = SK.countmin_stream(stream, coll, "user_id", str(tmp_path / "cms_ckpt"))
    q.awaitTermination(180)

    got = {
        (r["j"], r["bucket"]): r["c"] for r in SK.counters(coll).collect()
    }
    want = {
        (r["j"], r["bucket"]): r["c"]
        for r in SK._delta_counts(
            load(spark, sf_dir, "events"), "user_id"
        ).collect()
    }
    assert got == want
    assert sum(got.values()) == 4 * load(spark, sf_dir, "events").count()
    # the idempotency marker rides in the same commit as the counters
    meta = (
        coll.scan(columns=["slot", "bucket", "c"])
        .filter(F.col("slot") == SK.META_SLOT)
        .collect()
    )
    assert len(meta) == 1 and meta[0]["c"] >= 0


def test_mg_stream_heavy_hitters(spark, sf_dir, event_dir, tmp_path):
    """Incrementally-maintained Misra-Gries summary must satisfy the
    mergeable-summaries guarantee over the whole stream: every key with
    true frequency > 2n/(K+1) present, with est <= true and
    true - est <= n/(K+1) — under whatever batching availableNow picks.
    A 'heavy' key is planted at ~1/3 of the stream; the ~100 tail keys
    force constant compression (K=8 counters)."""
    from hadrodb_spark.sources.collection import HadroCollection
    from hadrodb_spark.streaming import sketch as SK

    skew = F.when(F.col("user_id") % 3 == 0, F.lit("heavy")).otherwise(
        F.col("user_id").cast("string")
    )
    coll = HadroCollection(spark, str(tmp_path / "mg"), SK.MG_SCHEMA)
    stream = S.stream_events(spark, event_dir).withColumn("skewed", skew)
    q = SK.mg_stream(stream, coll, "skewed", str(tmp_path / "mg_ckpt"))
    q.awaitTermination(180)

    summary = SK.mg_summary(coll)
    assert 0 < len(summary) <= SK.MG_K

    exact = {
        r["skewed"]: r["cnt"]
        for r in load(spark, sf_dir, "events")
        .withColumn("skewed", skew)
        .groupBy("skewed")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n = sum(exact.values())
    k1 = SK.MG_K + 1
    heavy = {t: c for t, c in exact.items() if c * k1 > 2 * n}
    assert heavy, "planted skew must produce at least one heavy hitter"
    for t, c in heavy.items():
        assert t in summary, (t, summary)
        est = summary[t]
        assert est <= c and (c - est) * k1 <= n, (t, est, c, n)

    # marker rides in the same commit as the summary (atomic replay guard)
    import json

    metas = (
        coll.scan(columns=["slot", "payload"])
        .filter(F.col("slot") == SK.MG_META_SLOT)
        .collect()
    )
    assert len(metas) == 1 and json.loads(metas[0]["payload"])["batch"] >= 0


def test_bitmap_distinct_stream_exact(spark, sf_dir, event_dir, tmp_path):
    """Incrementally-maintained bitmap state must yield EXACTLY the batch
    per-day distinct user counts — no tolerance, the property that
    separates bitmap state from the HLL/CMS sketches."""
    from hadrodb_spark.sources.collection import HadroCollection
    from hadrodb_spark.streaming import sketch as SK

    coll = HadroCollection(spark, str(tmp_path / "bmd"), SK.BMD_SCHEMA)
    stream = S.stream_events(spark, event_dir)
    q = SK.bitmap_distinct_stream(stream, coll, "user_id", str(tmp_path / "bmd_ckpt"))
    q.awaitTermination(180)

    got = {
        r["day"]: r["n_distinct"]
        for r in SK.bitmap_daily_counts(coll).collect()
    }
    want = {
        r["day"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


@pytest.mark.slow
def test_streaming_accumulators_survive_checkpoint_loss(
    spark, sf_dir, event_dir, tmp_path
):
    """Crash-replay drill for all three streaming accumulators: wipe
    Spark's checkpoint (losing its progress log) while KEEPING the
    collection, then rerun the whole stream. Every batch replays with the
    same batch ids; the in-collection marker (same checkpoint path) must
    short-circuit them, leaving counts EXACTLY unchanged — the atomicity
    property the docstrings claim, exercised end to end."""
    import shutil as _sh

    from hadrodb_spark.sources.collection import HadroCollection
    from hadrodb_spark.streaming import sketch as SK

    # --- count-min (read-modify-write sum: marker is load-bearing) ---
    def _run(q):
        assert q.awaitTermination(300), "stream did not finish in time"

    cms = HadroCollection(spark, str(tmp_path / "r_cms"), SK.CMS_SCHEMA)
    ck1 = str(tmp_path / "r_cms_ckpt")
    _run(SK.countmin_stream(S.stream_events(spark, event_dir), cms, "user_id", ck1))
    before = {(r["j"], r["bucket"]): r["c"] for r in SK.counters(cms).collect()}
    _sh.rmtree(ck1)
    _run(SK.countmin_stream(S.stream_events(spark, event_dir), cms, "user_id", ck1))
    after = {(r["j"], r["bucket"]): r["c"] for r in SK.counters(cms).collect()}
    assert after == before

    # --- Misra-Gries (driver merge: marker is load-bearing) ---
    mg = HadroCollection(spark, str(tmp_path / "r_mg"), SK.MG_SCHEMA)
    ck2 = str(tmp_path / "r_mg_ckpt")
    _run(SK.mg_stream(S.stream_events(spark, event_dir), mg, "event_type", ck2))
    before_mg = SK.mg_summary(mg)
    _sh.rmtree(ck2)
    _run(SK.mg_stream(S.stream_events(spark, event_dir), mg, "event_type", ck2))
    assert SK.mg_summary(mg) == before_mg

    # --- bitmap distinct (idempotent OR: exact even by algebra) ---
    bmd = HadroCollection(spark, str(tmp_path / "r_bmd"), SK.BMD_SCHEMA)
    ck3 = str(tmp_path / "r_bmd_ckpt")
    _run(SK.bitmap_distinct_stream(S.stream_events(spark, event_dir), bmd, "user_id", ck3))
    before_bm = {r["day"]: r["n_distinct"]
                 for r in SK.bitmap_daily_counts(bmd).collect()}
    _sh.rmtree(ck3)
    _run(SK.bitmap_distinct_stream(S.stream_events(spark, event_dir), bmd, "user_id", ck3))
    after_bm = {r["day"]: r["n_distinct"]
                for r in SK.bitmap_daily_counts(bmd).collect()}
    assert after_bm == before_bm


@pytest.mark.slow
def test_accumulators_recover_checkpoint_loss_with_new_data(
    spark, sf_dir, tmp_path
):
    """The r4-ADVICE hazard, end to end: lose the checkpoint AND land new
    source data, then rerun. availableNow renumbers batches from 0, so a
    bare ``batch_id <= marker`` skip would silently DROP the new rows.
    The replay policy must instead detect the fingerprint mismatch,
    REBUILD, and finish with an exact recount of old + new data:

    * CMS counters == the one-shot batch delta over the full directory;
    * MG summary satisfies the Misra-Gries guarantee over the full data;
    * bitmap counts == batch count_distinct over the full data (markerless
      by design — idempotent OR-merge needs no replay guard at all)."""
    import shutil as _sh

    from hadrodb_spark.sources.collection import HadroCollection
    from hadrodb_spark.streaming import sketch as SK

    src = str(tmp_path / "events")
    old = load(spark, sf_dir, "events")
    old.repartition(16).write.parquet(src)

    def _run(q):
        assert q.awaitTermination(300), "stream did not finish in time"

    cms = HadroCollection(spark, str(tmp_path / "n_cms"), SK.CMS_SCHEMA)
    mg = HadroCollection(spark, str(tmp_path / "n_mg"), SK.MG_SCHEMA)
    bmd = HadroCollection(spark, str(tmp_path / "n_bmd"), SK.BMD_SCHEMA)
    cks = {n: str(tmp_path / f"n_{n}_ckpt") for n in ("cms", "mg", "bmd")}
    _run(SK.countmin_stream(S.stream_events(spark, src), cms, "user_id", cks["cms"]))
    _run(SK.mg_stream(S.stream_events(spark, src), mg, "event_type", cks["mg"]))
    _run(SK.bitmap_distinct_stream(S.stream_events(spark, src), bmd, "user_id", cks["bmd"]))

    # crash: every checkpoint lost; meanwhile NEW data (disjoint users,
    # one new event type) lands in the source directory
    for ck in cks.values():
        _sh.rmtree(ck)
    new = old.limit(500).select(
        "ts",
        (F.col("user_id") + F.lit(1_000_000)).alias("user_id"),
        F.lit("ckpt_loss_probe").alias("event_type"),
        "value",
        "props",
    )
    new.repartition(4).write.mode("append").parquet(src)
    full = spark.read.parquet(src)

    _run(SK.countmin_stream(S.stream_events(spark, src), cms, "user_id", cks["cms"]))
    got = {(r["j"], r["bucket"]): r["c"] for r in SK.counters(cms).collect()}
    want = {
        (r["j"], r["bucket"]): r["c"]
        for r in SK._delta_counts(full, "user_id").collect()
    }
    assert got == want  # exact recount: old AND new, nothing dropped/doubled

    _run(SK.mg_stream(S.stream_events(spark, src), mg, "event_type", cks["mg"]))
    summary = SK.mg_summary(mg)
    exact = {
        r["event_type"]: r["cnt"]
        for r in full.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n, k1 = sum(exact.values()), SK.MG_K + 1
    for t, c in exact.items():
        if c * k1 > 2 * n:
            assert t in summary and summary[t] <= c and (c - summary[t]) * k1 <= n

    _run(SK.bitmap_distinct_stream(S.stream_events(spark, src), bmd, "user_id", cks["bmd"]))
    got_bm = {r["day"]: r["n_distinct"] for r in SK.bitmap_daily_counts(bmd).collect()}
    want_bm = {
        r["day"]: r["n"]
        for r in full.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got_bm == want_bm


def test_trending_topk_exactly_once_on_wal_replay(spark, sf_dir, event_dir, tmp_path):
    """A WAL replay (checkpoint commit lost AFTER the parquet write) must
    not duplicate the replayed batch's windows: the sink overwrites its
    own batch=N directory, so the replay rewrites identical content in
    place — idempotent with NO marker-ordering window at all."""
    import os

    out_dir = str(tmp_path / "tr_out")
    ckpt = str(tmp_path / "tr_ckpt")
    q = S.trending_topk_sink(
        S.tumbling_counts(S.stream_events(spark, event_dir)), out_dir, ckpt
    )
    q.awaitTermination()
    first = sorted(tuple(r) for r in S.read_trending(spark, out_dir).collect())
    assert first

    # crash simulation: sink appended, checkpoint commit didn't land —
    # drop the LAST commit file so the restarted query replays that batch
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    q2 = S.trending_topk_sink(
        S.tumbling_counts(S.stream_events(spark, event_dir)), out_dir, ckpt
    )
    q2.awaitTermination()
    after = sorted(tuple(r) for r in S.read_trending(spark, out_dir).collect())
    assert after == first  # replayed batch overwrote itself, no duplicates


@pytest.mark.slow
def test_native_collection_curation_end_to_end(spark, sf_dir, tmp_path):
    """The round-5 composition: documents kept in the reference's NATIVE
    format are streamed through the hadrolog reader into the curation
    funnel and land in a curated collection — byte-log in, deduplicated
    gated dataset out, no format conversion. Growth is consumed
    incrementally: a second native append (originals first ⇒
    first-batch-wins == keep-lowest-doc_id) triggers a second micro-batch
    whose planted copies are absorbed by the fingerprint anti-join.
    Final contents must EXACTLY equal the batch curation_pipeline."""
    from hadrodb_spark.operators import dedup, pipeline2
    from hadrodb_spark.sources import hadrolog
    from hadrodb_spark.sources.collection import HadroCollection
    from hadrodb_spark.streaming import curation as SC

    hadrolog.register(spark)
    native = str(tmp_path / ".docs_native")
    corpus = dedup._with_exact_copies(spark, sf_dir).select("doc_id", "text")
    corpus.filter(F.col("doc_id") < 200000).coalesce(2).write.format(
        "hadrolog"
    ).option("path", native).mode("append").save()

    coll = HadroCollection(spark, str(tmp_path / "curated_nat"), SC.CURATED_SCHEMA)
    ck = str(tmp_path / "nat_ckpt")
    SC.curate_native_stream(spark, native, coll, ck).awaitTermination(180)
    n_first = len(coll)
    assert n_first > 0

    # the log grows: planted copies appended as NEW native segments
    corpus.filter(F.col("doc_id") >= 200000).coalesce(1).write.format(
        "hadrolog"
    ).option("path", native).mode("append").save()
    SC.curate_native_stream(spark, native, coll, ck).awaitTermination(180)

    got = {
        r["doc_id"]: (r["quality"], r["n_tokens"])
        for r in coll.scan(columns=["doc_id", "quality", "n_tokens"]).collect()
    }
    want = {
        r["doc_id"]: (r["quality"], r["n_tokens"])
        for r in pipeline2.curation_pipeline(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) == n_first  # copies added nothing: dedup held


def test_accumulator_new_lineage_rebuilds_exact(spark, sf_dir, tmp_path):
    """A NEW checkpoint identity (fresh or relocated checkpoint dir) over
    the same source must REBUILD the accumulator to an exact recount —
    merging would double-count the redelivered history. Also covers the
    legacy pre-r5 marker format (raw path in the meta bucket): it parses
    as a foreign lineage and rebuilds instead of crashing."""
    import json as _json

    from hadrodb_spark.sources.collection import HadroCollection
    from hadrodb_spark.streaming import sketch as SK

    src = str(tmp_path / "ev")
    load(spark, sf_dir, "events").repartition(8).write.parquet(src)
    want = {
        (r["j"], r["bucket"]): r["c"]
        for r in SK._delta_counts(spark.read.parquet(src), "user_id").collect()
    }

    cms = HadroCollection(spark, str(tmp_path / "c1"), SK.CMS_SCHEMA)

    def _run(ck):
        q = SK.countmin_stream(
            S.stream_events(spark, src), cms, "user_id", str(tmp_path / ck)
        )
        assert q.awaitTermination(300)

    _run("ck_a")
    got = {(r["j"], r["bucket"]): r["c"] for r in SK.counters(cms).collect()}
    assert got == want

    # new lineage, same source: rebuild -> exact recount, NOT 2x
    _run("ck_b")
    got = {(r["j"], r["bucket"]): r["c"] for r in SK.counters(cms).collect()}
    assert got == want

    # legacy marker format: overwrite meta with the pre-r5 raw-path shape
    legacy = spark.createDataFrame(
        [(SK.META_SLOT, -1, str(tmp_path / "old_ckpt"), 3)], SK.CMS_SCHEMA
    )
    cms.append_df(legacy, key_col="slot")
    _run("ck_c")
    got = {(r["j"], r["bucket"]): r["c"] for r in SK.counters(cms).collect()}
    assert got == want  # parsed as foreign lineage, rebuilt exactly


def test_stream_reader_detects_compaction_across_restart(spark, tmp_path):
    """partitions(start, end) must validate CHECKPOINTED offsets: a
    consumed segment now missing, or shorter than its committed offset,
    is a rewritten log — raise, never silently skip committed data. This
    is the across-restart complement to the live-session guards."""
    import os

    import pytest as _pytest

    from hadrodb_spark.sources.hadrolog import HadroLogStreamReader

    d = str(tmp_path / "logs")
    os.makedirs(d)
    with open(f"{d}/00000000.data", "wb") as f:
        f.write(hadrolog_bytes(5))

    r = HadroLogStreamReader({"path": d})
    # vanished segment: checkpoint says we consumed 00000001 already
    with _pytest.raises(RuntimeError, match="gone"):
        r.partitions(
            {"segs": {"00000001.data": 40}},
            {"segs": {"00000000.data": 40}},
        )
    # shrunken segment: end offset below the committed start
    with _pytest.raises(RuntimeError, match="shrank"):
        r.partitions(
            {"segs": {"00000000.data": 400}},
            {"segs": {"00000000.data": 40}},
        )
    # live-session shrink: cache remembers more bytes than the file has
    r2 = HadroLogStreamReader({"path": d})
    r2._aligned["00000000.data"] = 10_000
    with _pytest.raises(RuntimeError, match="shrank"):
        r2.latestOffset()


def hadrolog_bytes(n):
    from hadrodb_spark.sources.hadrolog import encode_row_record

    return b"".join(encode_row_record((i, "x")) for i in range(n))
