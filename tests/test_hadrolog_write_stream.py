"""Cluster-safe native-format WRITE and incremental STREAM READ.

Closes the r4 VERDICT's top remaining storage gap: the reference's append
(``/root/reference/hadro/engine.py:122-137``) is its primary write API, but
our only native-format writer ran executor-side into a driver-local tempdir
(local-mode assumption). ``df.write.format("hadrolog")`` now goes through a
Python DataSource writer with the standard two-phase commit — each task
streams its partition into a uniquely-named staged file under the
DESTINATION directory (shared storage on a cluster), and the driver-side
commit publishes all staged segments with sequential numbers. No
driver-local paths anywhere in the data path.

The stream reader turns an existing native collection into a Structured
Streaming source (SURVEY §1.4's ``.tweets``-replay use case): offsets are
per-segment frame-aligned byte lengths, each micro-batch fans out one Spark
task per grown segment, and both new segments and in-place segment growth
(the reference's single-process appender keeps extending ``00000000.data``)
are picked up incrementally.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hadrodb_spark.sources import hadrolog

TWEET_DDL = "tweet_id bigint, user_id bigint, ts_s bigint, text string"

TWEET_SCHEMA = T.StructType(
    [
        T.StructField("tweet_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_s", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _tweets(spark, n, start_id=0, t0=1_700_000_000):
    rows = [
        (start_id + i, (start_id + i) % 3, t0 + start_id * 60 + i * 60, f"tweet {start_id + i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, TWEET_SCHEMA)


def _scan(spark, d):
    hadrolog.register(spark)
    return (
        spark.read.format("hadrolog").option("path", d).option("ddl", TWEET_DDL).load()
    )


def test_writer_append_publishes_sequential_segments(spark, tmp_path):
    hadrolog.register(spark)
    d = str(tmp_path / ".tweets")
    _tweets(spark, 40).repartition(4).write.format("hadrolog").option(
        "path", d
    ).mode("append").save()

    segs = sorted(f for f in os.listdir(d) if f.endswith(".data"))
    assert segs == [f"{i:08d}.data" for i in range(len(segs))]
    assert 1 <= len(segs) <= 4  # one per non-empty input partition
    assert not [f for f in os.listdir(d) if f.startswith("_staging")]

    got = {tuple(r) for r in _scan(spark, d).collect()}
    want = {tuple(r) for r in _tweets(spark, 40).collect()}
    assert got == want

    # second append lands AFTER the existing segments, nothing clobbered
    _tweets(spark, 10, start_id=40).repartition(2).write.format("hadrolog").option(
        "path", d
    ).mode("append").save()
    segs2 = sorted(f for f in os.listdir(d) if f.endswith(".data"))
    assert len(segs2) > len(segs) and segs2[: len(segs)] == segs
    assert _scan(spark, d).count() == 50


def test_writer_overwrite_and_tombstones(spark, tmp_path):
    hadrolog.register(spark)
    d = str(tmp_path / "coll")
    _tweets(spark, 20).write.format("hadrolog").option("path", d).mode(
        "append"
    ).save()

    # overwrite replaces the collection; deleted_col frames tombstones that
    # are physically present but skipped at scan (engine.py:169-170)
    df = _tweets(spark, 30).withColumn("gone", F.col("tweet_id") % 5 == 0)
    df.repartition(3).write.format("hadrolog").option("path", d).option(
        "deleted_col", "gone"
    ).mode("overwrite").save()

    live = _scan(spark, d)
    assert live.count() == 24
    assert live.filter(F.col("tweet_id") % 5 == 0).count() == 0
    # tombstones ARE in the log (raw mode sees them)
    raw = (
        spark.read.format("hadrolog")
        .option("path", d)
        .option("include_deleted", "true")
        .load()
    )
    assert raw.count() == 30
    assert raw.filter(F.col("flags") == hadrolog.DELETED_FLAG).count() == 6


def test_writer_rejects_missing_deleted_col(spark, tmp_path):
    hadrolog.register(spark)
    with pytest.raises(Exception, match="deleted_col"):
        _tweets(spark, 5).write.format("hadrolog").option(
            "path", str(tmp_path / "x")
        ).option("deleted_col", "nope").mode("append").save()


def test_stream_reader_incremental_tweets_sessions(spark, tmp_path):
    """The SURVEY §1.4 use case end to end: a ``.tweets``-shaped native
    collection replayed through ``readStream`` into per-user session
    windows, with BOTH growth modes picked up incrementally — new segment
    files (a cluster append) and in-place growth of an existing segment
    (the reference's own appender, ``hadro/engine.py:131-132``)."""
    hadrolog.register(spark)
    d = str(tmp_path / ".tweets")
    _tweets(spark, 30).repartition(2).write.format("hadrolog").option(
        "path", d
    ).mode("append").save()

    stream = (
        spark.readStream.format("hadrolog")
        .option("path", d)
        .option("ddl", TWEET_DDL)
        .load()
    )
    sessions = (
        stream.withColumn("ts", F.timestamp_seconds("ts_s"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_tweets"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_tweets",
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("tweet_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.table("tweet_sessions").agg(F.sum("n_tweets")).first()[0]
        assert n1 == 30

        # growth mode 1: a second job appends new segments
        _tweets(spark, 12, start_id=30).write.format("hadrolog").option(
            "path", d
        ).mode("append").save()
        # growth mode 2: the reference-style appender extends segment 0
        with open(os.path.join(d, "00000000.data"), "ab") as f:
            for i in range(5):
                f.write(
                    hadrolog.encode_row_record(
                        (1000 + i, 7, 1_700_100_000 + i * 60, f"late {i}")
                    )
                )
        q.processAllAvailable()

        got = {
            (r["user_id"], r["session_start"], r["session_end"]): r["n_tweets"]
            for r in spark.table("tweet_sessions").collect()
        }
    finally:
        q.stop()

    # oracle: the same session windows computed in one batch pass
    want_df = (
        _scan(spark, d)
        .withColumn("ts", F.timestamp_seconds("ts_s"))
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_tweets"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_tweets",
        )
    )
    want = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_tweets"]
        for r in want_df.collect()
    }
    assert got == want and sum(got.values()) == 47


def test_stream_reader_skips_torn_tail_until_completed(spark, tmp_path):
    """A torn (partially-written) trailing frame must NOT be consumed —
    offsets are frame-aligned, so the batch stops at the last complete
    record and picks the frame up once its bytes are all there."""
    hadrolog.register(spark)
    d = str(tmp_path / "torn")
    _tweets(spark, 6).coalesce(1).write.format("hadrolog").option(
        "path", d
    ).mode("append").save()
    seg = os.path.join(d, "00000000.data")
    full = hadrolog.encode_row_record((99, 1, 1_700_000_000, "tail"))
    with open(seg, "ab") as f:
        f.write(full[: len(full) // 2])  # crashed appender mid-frame

    stream = (
        spark.readStream.format("hadrolog")
        .option("path", d)
        .option("ddl", TWEET_DDL)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("torn_rows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("torn_rows").count() == 6
        with open(seg, "ab") as f:
            f.write(full[len(full) // 2 :])  # appender recovered
        q.processAllAvailable()
        rows = {tuple(r) for r in spark.table("torn_rows").collect()}
    finally:
        q.stop()
    assert (99, 1, 1_700_000_000, "tail") in rows and len(rows) == 7


def test_writer_roundtrip_property(spark, tmp_path):
    """Property: arbitrary typed rows survive write→scan bit-exactly —
    NULLs in every column, unicode (incl. astral planes), int64 edges,
    binary payloads, empty strings. One hypothesis-driven data set pushed
    through the real executor write path (not mpack in isolation: this
    covers Row→tuple extraction, tombstone framing, and the typed scan's
    positional decode)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    hadrolog.register(spark)

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("b", T.BinaryType()),
            T.StructField("f", T.DoubleType()),
        ]
    )
    row = st.tuples(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.one_of(st.none(), st.text(max_size=40)),
        st.one_of(st.none(), st.binary(max_size=40)),
        st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
    )

    case = [0]

    @settings(
        max_examples=5,  # each example is a real Spark write+scan job
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(row, min_size=1, max_size=30, unique_by=lambda r: r[0]))
    def check(rows):
        case[0] += 1
        d = str(tmp_path / f"prop_{case[0]}")
        spark.createDataFrame(rows, schema).repartition(3).write.format(
            "hadrolog"
        ).option("path", d).mode("append").save()
        got = sorted(
            (tuple(r) for r in _scan_ddl(spark, d).collect()),
            key=lambda t: t[0],
        )
        want = sorted(rows, key=lambda t: t[0])
        assert got == want

    check()


def _scan_ddl(spark, d):
    return (
        spark.read.format("hadrolog")
        .option("path", d)
        .option("ddl", "k bigint, s string, b binary, f double")
        .load()
    )


def test_writer_commit_never_overwrites_existing_segment(spark, tmp_path):
    """Publish uses create-exclusive link semantics: if a concurrent
    committer (simulated here by pre-placing a file at the number the
    commit would pick) already owns a segment number, the commit skips to
    the next free number instead of silently clobbering data."""
    hadrolog.register(spark)
    d = str(tmp_path / "race")
    _tweets(spark, 10).coalesce(1).write.format("hadrolog").option(
        "path", d
    ).mode("append").save()
    # a "concurrent job" grabs the next two numbers with real content
    squatter = hadrolog.encode_row_record((9999, 9, 1_700_000_000, "squat"))
    for i in (1, 2):
        with open(os.path.join(d, f"{i:08d}.data"), "wb") as f:
            f.write(squatter)

    _tweets(spark, 5, start_id=10).coalesce(1).write.format("hadrolog").option(
        "path", d
    ).mode("append").save()

    segs = sorted(f for f in os.listdir(d) if f.endswith(".data"))
    assert segs == [f"{i:08d}.data" for i in range(4)]
    rows = {tuple(r) for r in _scan(spark, d).collect()}
    # both squatter frames AND the appended batch survive — nothing clobbered
    assert (9999, 9, 1_700_000_000, "squat") in rows
    assert len(rows) == 16  # 10 + 5 + 1 distinct squatter tuple


@pytest.mark.slow
def test_stream_reader_raises_on_segment_removal(spark, tmp_path):
    """Compaction under a live stream must fail LOUDLY, not stall with
    stale offsets: removing an already-consumed segment makes the next
    poll raise."""
    hadrolog.register(spark)
    d = str(tmp_path / "shrink")
    _tweets(spark, 8).repartition(2).write.format("hadrolog").option(
        "path", d
    ).mode("append").save()
    stream = (
        spark.readStream.format("hadrolog")
        .option("path", d)
        .option("ddl", TWEET_DDL)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("shrink_rows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("shrink_rows").count() == 8
        os.remove(os.path.join(d, "00000001.data"))  # "compaction"
        with pytest.raises(Exception, match="removed mid-stream"):
            q.processAllAvailable()
            # some Spark versions surface the poll failure on stop/status
            if q.exception() is not None:
                raise q.exception()
    finally:
        try:
            q.stop()
        except Exception:
            pass


def test_reader_filter_pushdown_and_segment_pruning(spark, tmp_path):
    """Spark 4.1 Python-DataSource filter pushdown, both modes: typed
    scans enforce pushed predicates record-side (results must equal the
    unpushed truth for =, range, IN, IS NULL shapes), and a raw-mode
    equality/IN filter on ``segment`` prunes whole files at planning
    time — verified directly on the reader's partitions()."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from hadrodb_spark.sources.hadrolog import HadroLogReader

    hadrolog.register(spark)
    d = str(tmp_path / "push")
    df = _tweets(spark, 60).withColumn(
        "text", F.when(F.col("tweet_id") % 7 == 0, F.lit(None)).otherwise(F.col("text"))
    )
    df.repartition(3).write.format("hadrolog").option("path", d).mode(
        "append"
    ).save()

    scan = lambda: _scan(spark, d)
    cases = [
        scan().filter(F.col("user_id") == 1),
        scan().filter((F.col("tweet_id") > 40) & (F.col("user_id") != 2)),
        scan().filter(F.col("user_id").isin(0, 2)),
        scan().filter(F.col("text").isNull()),
        scan().filter(F.col("text").isNotNull() & (F.col("ts_s") <= 1_700_001_800)),
    ]
    truth = [tuple(r) for r in _tweets(spark, 60).withColumn(
        "text", F.when(F.col("tweet_id") % 7 == 0, F.lit(None)).otherwise(F.col("text"))
    ).collect()]
    import operator
    wants = [
        [t for t in truth if t[1] == 1],
        [t for t in truth if t[0] > 40 and t[1] != 2],
        [t for t in truth if t[1] in (0, 2)],
        [t for t in truth if t[3] is None],
        [t for t in truth if t[3] is not None and t[2] <= 1_700_001_800],
    ]
    for got_df, want in zip(cases, wants):
        assert sorted(tuple(r) for r in got_df.collect()) == sorted(want)

    # raw-mode planning: segment filters prune files before any read
    r = HadroLogReader({"path": d})
    rest = r.pushFilters([EqualTo(("segment",), "00000001.data")])
    assert rest == []
    parts = r.partitions()
    assert [os.path.basename(p.path) for p in parts] == ["00000001.data"]

    r2 = HadroLogReader({"path": d})
    assert r2.pushFilters([In(("segment",), ("00000000.data", "00000002.data"))]) == []
    assert len(r2.partitions()) == 2

    # unsupported shapes are returned for Spark to evaluate, not dropped
    r3 = HadroLogReader({"path": d, "ddl": TWEET_DDL})
    leftover = r3.pushFilters([GreaterThan(("nope",), 1)])
    assert len(leftover) == 1 and r3.partitions()

    # end-to-end raw query on one segment still decodes correctly
    one = (
        spark.read.format("hadrolog")
        .option("path", d)
        .load()
        .filter(F.col("segment") == "00000001.data")
    )
    assert 0 < one.count() < 60


def test_compact_native_collection_drops_tombstones_and_shrinks(spark, tmp_path):
    """Compaction must preserve exactly the live set, physically remove
    every tombstone, and shrink the on-disk log."""
    from hadrodb_spark.operators.nativefmt import compact_native_collection

    hadrolog.register(spark)
    src = str(tmp_path / "src")
    dest = str(tmp_path / "compacted")
    df = _tweets(spark, 30).withColumn("gone", F.col("tweet_id") % 3 == 0)
    df.repartition(3).write.format("hadrolog").option("path", src).option(
        "deleted_col", "gone"
    ).mode("append").save()

    compact_native_collection(spark, src, dest, ddl=TWEET_DDL)

    live_src = {tuple(r) for r in _scan(spark, src).collect()}
    live_dst = {tuple(r) for r in _scan(spark, dest).collect()}
    assert live_dst == live_src and len(live_dst) == 20

    raw = (
        spark.read.format("hadrolog")
        .option("path", dest)
        .option("include_deleted", "true")
        .load()
    )
    assert raw.count() == 20
    assert raw.filter(F.col("flags") == hadrolog.DELETED_FLAG).count() == 0

    def log_bytes(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".data")
        )

    assert log_bytes(dest) < log_bytes(src)


def test_writer_concurrent_commit_property(tmp_path):
    """Property (r7 VERDICT task #5): two appender jobs whose driver-side
    ``commit()`` phases race on threads, plus a third job that crashes
    between phase 1 (tasks staged) and phase 2 (publish).  Invariants, for
    arbitrary row sets / task splits / pre-existing segments:

    * no lost commit — every row both committers staged is readable after;
    * no duplicated commit — the readable multiset equals seeds + A + B
      exactly (the EEXIST-advance loop must not re-link a staged file);
    * no torn commit — every published segment parses to exact EOF;
    * the crashed job's rows are invisible (staging dir never published)
      and its ``abort()`` removes the garbage.

    The commit phase is plain driver-side Python (hadrolog.py:365-394), so
    racing the method itself exercises the real interleaving: both threads
    scan the same ``existing`` listing, collide on the same next segment
    number, and must resolve via the create-exclusive ``os.link``.
    """
    import threading

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("s", T.StringType())]
    )
    row = st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.text(max_size=12),
    )
    case = [0]

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        rows_a=st.lists(row, min_size=1, max_size=12),
        rows_b=st.lists(row, min_size=1, max_size=12),
        rows_crash=st.lists(row, min_size=1, max_size=4),
        tasks_a=st.integers(min_value=1, max_value=3),
        tasks_b=st.integers(min_value=1, max_value=3),
        n_seed=st.integers(min_value=0, max_value=2),
    )
    def check(rows_a, rows_b, rows_crash, tasks_a, tasks_b, n_seed):
        case[0] += 1
        d = str(tmp_path / f"cc_{case[0]}")
        os.makedirs(d)
        seeds = [(10_000 + i, f"seed{i}") for i in range(n_seed)]
        for i, r in enumerate(seeds):
            with open(os.path.join(d, f"{i:08d}.data"), "wb") as f:
                f.write(hadrolog.encode_row_record(r))

        def staged_job(rows, n_tasks):
            w = hadrolog.HadroLogWriter({"path": d}, schema, overwrite=False)
            chunks = [rows[i::n_tasks] for i in range(n_tasks)]
            return w, [w.write(iter(c)) for c in chunks]

        wa, msgs_a = staged_job(rows_a, tasks_a)
        wb, msgs_b = staged_job(rows_b, tasks_b)
        wc, _msgs_c = staged_job(rows_crash, 1)  # crashes before commit

        barrier = threading.Barrier(2)
        errs = []

        def run(writer, msgs):
            try:
                barrier.wait()
                writer.commit(msgs)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [
            threading.Thread(target=run, args=(wa, msgs_a)),
            threading.Thread(target=run, args=(wb, msgs_b)),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs

        segs = sorted(f for f in os.listdir(d) if f.endswith(".data"))
        got = []
        for fn in segs:
            p = os.path.join(d, fn)
            consumed = 0
            for off, _flags, payload in hadrolog.iter_records(
                p, include_deleted=True
            ):
                got.append(hadrolog.decode_payload(payload))
                consumed = off + 5 + len(payload)
            # no torn commit: the frame loop consumed the file exactly
            assert consumed == os.path.getsize(p), fn

        want = sorted(seeds + rows_a + rows_b)
        assert sorted(got) == want  # no lost, no duplicated, crash invisible

        # the crashed job left only an unpublished staging dir; abort cleans
        staging = [f for f in os.listdir(d) if f.startswith("_staging_")]
        assert len(staging) == 1
        wc.abort(None)
        assert not [f for f in os.listdir(d) if f.startswith("_staging_")]

    check()
