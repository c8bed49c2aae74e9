"""Streaming anomaly detection: per-user expanding-history z-score flagging,
the stateful-operator formulation of ``operators.pipeline3.anomaly_zscore``.

Each user's state is three numbers — (count, sum, sum-of-squares) — updated
per micro-batch with vectorized numpy cumulatives (no per-row Python loop).
An event is flagged when at least 20 PRIOR observations exist and its value
sits more than 3σ from the prior mean, exactly like the batch query's
``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` window.

Scale design: state is O(1) per user (three doubles), partitioned by the
groupBy — a billion users is a billion tiny state rows spread over the
cluster's state store, never history. The batch twin carries the DuckDB
oracle; the streaming path is verified against it (same flagged set) in
``tests/test_streaming.py``.

Ordering contract: ``flag_anomalies`` sorts WITHIN each micro-batch only —
its prior-statistics fold is exact when each user's events arrive in
event-time order ACROSS batches (the monotone-source case, e.g. an
append-only log tailed in commit order). When batches can interleave event
time (multi-source backfill, late data), use ``flag_anomalies_ordered``:
it buffers events in state until the watermark passes them, then folds in
exact (ts, event_id) order — trading O(delay-window) state per user and
watermark-delayed emission for cross-batch exactness.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from hadrodb_spark.operators.pipeline3 import _ANOM_MIN_N, _ANOM_SIGMA

FLAGS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("ss", T.DoubleType()),
    ]
)


def flag_anomalies(events: DataFrame) -> DataFrame:
    """``events`` (streaming or batch relation with user_id/event_id/ts/
    value) → flagged rows, state updated per micro-batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n0, s0, ss0 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            v = pdf["value"].fillna(0.0).to_numpy(dtype=np.float64)
            cs = s0 + np.cumsum(v)
            css = ss0 + np.cumsum(v * v)
            pre_n = n0 + np.arange(len(v), dtype=np.int64)
            pre_s = cs - v
            pre_ss = css - v * v
            with np.errstate(divide="ignore", invalid="ignore"):
                mean = pre_s / pre_n
                var = (pre_ss - pre_s * pre_s / pre_n) / pre_n
                z = (v - mean) / np.sqrt(var)
            flag = (pre_n >= _ANOM_MIN_N) & (np.abs(z) > _ANOM_SIGMA)
            n0, s0, ss0 = int(pre_n[-1] + 1), float(cs[-1]), float(css[-1])
            if flag.any():
                yield pd.DataFrame(
                    {
                        "user_id": pdf["user_id"].to_numpy()[flag],
                        "event_id": pdf["event_id"].to_numpy()[flag],
                        "value": v[flag],
                        "z": np.round(z[flag], 6),
                    }
                )
        state.update((n0, s0, ss0))

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FLAGS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_BUF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("ss", T.DoubleType()),
        T.StructField("buf_ts", T.ArrayType(T.LongType())),    # event-time µs
        T.StructField("buf_id", T.ArrayType(T.LongType())),
        T.StructField("buf_val", T.ArrayType(T.DoubleType())),
    ]
)


def flag_anomalies_ordered(events: DataFrame, delay: str = "40 minutes") -> DataFrame:
    """Cross-batch exact variant: per-user events buffer in state until the
    watermark passes them, then fold into the running statistics in strict
    ``(ts, event_id)`` order — so the flagged set is identical no matter how
    micro-batches interleave event time (bounded by ``delay`` lateness;
    rows older than the watermark are dropped by Spark before reaching the
    state function, the standard watermark contract).

    Mechanics: each invocation re-arms an event-time timeout just past the
    current watermark, so buffered events are flushed as the watermark
    advances even when the user receives no new rows in a batch. State per
    user is O(events within the delay window), not O(history) — the 100 TB
    posture is `delay` sized to the source's real out-of-orderness.
    """
    events = events.withWatermark("ts", delay)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            n0, s0, ss0, bts, bid, bval = state.get
            bts, bid, bval = list(bts), list(bid), list(bval)
        else:
            n0, s0, ss0, bts, bid, bval = 0, 0.0, 0.0, [], [], []
        for pdf in pdfs:  # empty iterator on a timeout invocation
            if len(pdf):
                # normalize to ns first: Arrow may hand back datetime64[us]
                bts += (
                    pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
                ).tolist()
                bid += pdf["event_id"].astype("int64").tolist()
                bval += pdf["value"].fillna(0.0).astype("float64").tolist()
        order = sorted(range(len(bts)), key=lambda i: (bts[i], bid[i]))
        # strictly-before-watermark finalizes; ts == watermark could still
        # gain a same-ts sibling in a later batch, so it waits one advance
        fin = [i for i in order if bts[i] < wm_us]
        keep = [i for i in order if bts[i] >= wm_us]
        if fin:
            v = np.array([bval[i] for i in fin], dtype=np.float64)
            cs = s0 + np.cumsum(v)
            css = ss0 + np.cumsum(v * v)
            pre_n = n0 + np.arange(len(v), dtype=np.int64)
            pre_s = cs - v
            pre_ss = css - v * v
            with np.errstate(divide="ignore", invalid="ignore"):
                mean = pre_s / pre_n
                var = (pre_ss - pre_s * pre_s / pre_n) / pre_n
                z = (v - mean) / np.sqrt(var)
            flag = (pre_n >= _ANOM_MIN_N) & (np.abs(z) > _ANOM_SIGMA)
            n0, s0, ss0 = int(pre_n[-1] + 1), float(cs[-1]), float(css[-1])
            if flag.any():
                yield pd.DataFrame(
                    {
                        "user_id": np.full(int(flag.sum()), key[0], dtype=np.int64),
                        "event_id": np.array([bid[i] for i in fin], dtype=np.int64)[flag],
                        "value": v[flag],
                        "z": np.round(z[flag], 6),
                    }
                )
        state.update(
            (
                n0,
                s0,
                ss0,
                [bts[i] for i in keep],
                [bid[i] for i in keep],
                [bval[i] for i in keep],
            )
        )
        # fire again as soon as the watermark moves, with or without data
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FLAGS_SCHEMA,
        stateStructType=_BUF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
