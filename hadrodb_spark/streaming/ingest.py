"""Streaming ingest into collections + custom stateful operators.

``stream_into_collection`` closes the loop on the reference's event-log use
case: a stream lands in a HadroCollection via ``foreachBatch`` — each
micro-batch is one atomic segment commit (the RELAXED write-consistency
batch, ``/root/reference/hadro/config.py`` parity), so a crashed query
resumes from its checkpoint without torn segments.

``running_user_totals`` shows the custom-stateful-operator escape hatch
(``applyInPandasWithState``) for semantics windowed aggregation can't
express: an unbounded running counter per key emitting an update per batch.
State is hash-partitioned by key → horizontal scale; the timeout
configuration bounds idle-state memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.query import StreamingQuery

from hadrodb_spark.sources.collection import HadroCollection

TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)


def stream_into_collection(
    stream: DataFrame,
    coll: HadroCollection,
    key_col: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Land a stream in a collection; one micro-batch = one atomic commit.

    Exactly-once: foreachBatch is at-least-once (a crash between the
    collection commit and the checkpoint write replays the batch), so the
    last landed (batch id, content fingerprint) is recorded next to the
    collection and a batch is skipped ONLY on a full match — a true WAL
    replay of the batch that wrote the marker. A bare ``batch_id <=
    marker`` skip (the pre-r5 shape) silently DROPPED data after
    checkpoint loss: availableNow renumbers batches from 0 over the
    grown source, so a renumbered batch carrying unseen rows matched the
    stale marker. Any non-matching batch — renumbered redelivery
    included — is appended; re-appending previously-landed rows in
    arrival order is LOGICALLY idempotent under the LWW view (the latest
    version of each key still wins; the extra physical versions are what
    ``compact()`` purges), so correctness never depends on the skip.

    Batch ids are scoped to a CHECKPOINT, not to the sink: the marker
    records the checkpoint identity and is ignored (then overwritten)
    when a different checkpoint starts writing — re-pointing a new query
    at an existing collection must not drop its first batches (ADVICE
    r1). The fingerprint covers ALL columns: a CDC stream can redeliver
    the same key set with NEW values, which must not look like a
    replay."""
    import os

    from hadrodb_spark.streaming import replay

    marker = os.path.join(coll.path, "_hadro_stream_batch.json")
    ckpt_id = os.path.abspath(checkpoint)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        fp = replay.batch_fingerprint(batch)
        if replay.is_wal_replay(marker, ckpt_id, batch_id, fp):
            return
        coll.append_df(batch, key_col=key_col)
        replay.stamp_marker(marker, ckpt_id, batch_id, fp)

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_merge_into_collection(
    stream: DataFrame,
    coll: HadroCollection,
    key_col: str,
    checkpoint: str,
    when_matched: str = "update",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming MERGE: each micro-batch upserts into the collection via
    ``merge_df`` (one semi/anti-join split + one atomic segment commit per
    batch) — the CDC-apply shape, where the stream carries the latest row
    per key and the collection converges to it.

    Same (batch id, all-column content fingerprint) replay guard as
    ``stream_into_collection``: skip ONLY a full-match WAL replay, so a
    re-applied update can't mint spurious extra versions, while a
    checkpoint-loss redelivery (renumbered batches, possibly carrying
    NEW values for old keys) is re-merged — deterministic merges applied
    in arrival order converge to the same final state."""
    import os

    from hadrodb_spark.streaming import replay

    marker = os.path.join(coll.path, "_hadro_stream_batch.json")
    ckpt_id = os.path.abspath(checkpoint)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        fp = replay.batch_fingerprint(batch)
        if replay.is_wal_replay(marker, ckpt_id, batch_id, fp):
            return
        coll.merge_df(batch, key_col=key_col, when_matched=when_matched)
        replay.stamp_marker(marker, ckpt_id, batch_id, fp)

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals on the transformWithStateInPandas API (the
    applyInPandasWithState successor, present in this PySpark build) — same
    semantics as :func:`running_user_totals`, state held in a typed
    ValueState keyed by user. Prefer this form where available: the new
    operator supports state TTL, timers, and multiple typed state variables
    per key.

    Environment note: the operator's Python worker speaks protobuf to the
    JVM state server (it imports
    ``pyspark.sql.streaming.proto.StateMessage_pb2``, whose generated code
    needs the google.protobuf RUNTIME — a separate package pyspark does
    not bundle).  In environments without it (this one: no package index
    to install from, nothing to vendor) the worker crashes at startup —
    use :func:`running_user_totals` there. Requires the RocksDB state
    store provider (``spark.sql.streaming.stateStore.providerClass``)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._totals.update((n, round(total, 2)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Unbounded per-user running totals via applyInPandasWithState."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
