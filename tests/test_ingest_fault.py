"""Exactly-once ingest under a MID-BATCH crash (round-9 VERDICT task #5).

test_catalog_ingest.py certifies replay-skip on clean restarts and
checkpoint loss; these tests kill ``foreachBatch`` inside the two
possible crash windows of ``stream_into_collection``'s commit protocol
and prove the LWW view still equals the duplicate-free batch table:

* window A — after the segment append, BEFORE the marker commit: the
  batch re-delivers on restart, the marker does not match, and the
  re-append lands duplicate physical versions that the LWW view absorbs
  (the documented at-least-once + logical-idempotence leg);
* window B — after the marker commit, BEFORE Spark's own checkpoint
  commit: the redelivered batch is a true WAL replay, the marker
  matches, and the batch is SKIPPED — no duplicate physical versions at
  all (the exactly-once leg the marker exists for).

The crash is injected by patching ``replay.stamp_marker`` (resolved at
call time inside the foreachBatch closure), which is byte-equivalent to
the process dying at that line: the append has committed (it is an
atomic collection commit), the marker/checkpoint writes have not.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T
from pyspark.sql.streaming.query import StreamingQueryException

from hadrodb_spark.sources.collection import HadroCollection
from hadrodb_spark.streaming import replay
from hadrodb_spark.streaming.ingest import stream_into_collection

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), True),
        T.StructField("v", T.StringType(), True),
    ]
)


def _write_waves(spark, src: str) -> dict[str, str]:
    """Three single-file waves with OVERLAPPING keys so the LWW outcome
    is order-sensitive: 0-19 'a', then 0-9 'b', then 0-4 'c'.  Separate
    writes ⇒ increasing mtimes ⇒ FileStreamSource batches them in wave
    order under maxFilesPerTrigger=1."""
    spark.range(20).selectExpr("id AS k", "'a' AS v").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.range(10).selectExpr("id AS k", "'b' AS v").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.range(5).selectExpr("id AS k", "'c' AS v").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    expected = {str(k): "a" for k in range(20)}
    expected.update({str(k): "b" for k in range(10)})
    expected.update({str(k): "c" for k in range(5)})
    return expected


def _stream(spark, src: str):
    return (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _scan_map(coll: HadroCollection) -> dict[str, str]:
    return {r["k"]: r["v"] for r in coll.scan().selectExpr("CAST(k AS STRING) k", "v").collect()}


def _crash_run(spark, src, coll, ck, monkeypatch, stamp_impl):
    """Run the ingest with ``stamp_impl`` substituted for the marker
    write; the injected crash must surface as a failed query."""
    monkeypatch.setattr(replay, "stamp_marker", stamp_impl)
    try:
        q = stream_into_collection(_stream(spark, src), coll, "k", ck)
        with pytest.raises(StreamingQueryException):
            q.awaitTermination()
    finally:
        monkeypatch.undo()


def test_crash_after_append_before_marker_recovers_exactly(
    spark, tmp_path, monkeypatch
):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    coll = HadroCollection(spark, str(tmp_path / "coll"), SCHEMA)
    expected = _write_waves(spark, src)

    real_stamp = replay.stamp_marker
    calls = {"n": 0}

    def dying_stamp(marker, ckpt_id, batch_id, fp):
        calls["n"] += 1
        if calls["n"] == 2:
            # batch 1's append has committed; die before the marker write
            raise RuntimeError("injected crash: after append, before marker")
        real_stamp(marker, ckpt_id, batch_id, fp)

    _crash_run(spark, src, coll, ck, monkeypatch, dying_stamp)

    # the segment landed (append is an atomic collection commit)...
    commits_after_crash = coll._read_manifest()["commits"]
    assert commits_after_crash == 2  # batch 0 + batch 1's orphaned append
    # ...but the marker still records batch 0, so the restart re-delivers
    q = stream_into_collection(_stream(spark, src), coll, "k", ck)
    q.awaitTermination()

    # batch 1 re-appended (marker mismatch ⇒ process) + batch 2: physical
    # versions grew, the LWW view did not
    assert coll._read_manifest()["commits"] == 4
    assert coll._log().count() == 20 + 10 + 10 + 5  # wave 1 + wave 2 twice + wave 3
    assert _scan_map(coll) == expected
    assert len(coll) == 20


def test_crash_after_marker_before_checkpoint_skips_replay(
    spark, tmp_path, monkeypatch
):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    coll = HadroCollection(spark, str(tmp_path / "coll"), SCHEMA)
    expected = _write_waves(spark, src)

    real_stamp = replay.stamp_marker
    calls = {"n": 0}

    def dying_stamp(marker, ckpt_id, batch_id, fp):
        calls["n"] += 1
        real_stamp(marker, ckpt_id, batch_id, fp)
        if calls["n"] == 2:
            # marker committed; die before Spark's checkpoint commit
            raise RuntimeError("injected crash: after marker, before checkpoint")

    _crash_run(spark, src, coll, ck, monkeypatch, dying_stamp)

    commits_after_crash = coll._read_manifest()["commits"]
    assert commits_after_crash == 2  # batch 0 + batch 1, both fully landed
    q = stream_into_collection(_stream(spark, src), coll, "k", ck)
    q.awaitTermination()

    # the redelivered batch 1 is a TRUE WAL replay (marker matches) and is
    # skipped — only batch 2 adds a commit; zero duplicate versions
    assert coll._read_manifest()["commits"] == 3
    assert coll._log().count() == 20 + 10 + 5
    assert _scan_map(coll) == expected
    assert len(coll) == 20
